"""Boilerpipe NumWordsRules block classification (Kohlschütter,
Fankhauser, Nejdl: "Boilerplate Detection using Shallow Text Features",
WSDM 2010).

The third main-content arm next to the Readability scorer
(reader_spark/readability.py) and jusText (ops/justext.py): the
paper's famous densitometric result is that TWO shallow features —
words-per-block and link density — of the current block and its
immediate neighbours classify boilerplate almost as well as full DOM
analysis. This is the published NumWordsRulesClassifier decision tree,
verbatim:

    if curr.link_density > 0.333333:                boilerplate
    elif prev.link_density <= 0.555556:
        if curr.num_words <= 16:
            if next.num_words <= 15:
                content iff prev.num_words > 4
            else:                                   content
        else:                                       content
    else:  # prev block is link-dense (nav context)
        if curr.num_words <= 40:
            content iff next.num_words > 17
        else:                                       content

Missing neighbours at document edges take num_words=0 and
link_density=0.0, matching boilerpipe's TextBlock.EMPTY_START/EMPTY_END
sentinels.

Shape at 100 TB: features are a pure map; the neighbour context is ONE
lag + lead pair over a window PARTITIONED BY document — partitions
bounded by blocks-per-page, the only shuffle keys on doc_id, and the
tree itself is a nested CASE riding whole-stage codegen. No UDF, no
global window, no second exchange.

vakra-dev/reader context: its content-cleaner removes nav/boilerplate
with tag heuristics (src/utils/content-cleaner.ts); this classifier is
the text-statistics fallback for pages whose markup gives no signal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MAX_LINK_DENSITY_CURR = 0.333333
MAX_LINK_DENSITY_PREV = 0.555556


def text_blocks(
    blocks: DataFrame,
    text_col: str = "text",
    link_words_col: str = "link_words",
) -> DataFrame:
    """Derive the two shallow features from raw block text: num_words
    (space-token count) and link_density (anchor words / total words,
    0.0 for empty blocks). Pure map."""
    n = F.size(F.split(F.col(text_col), " "))
    ld = F.when(n > 0, F.col(link_words_col) / n).otherwise(F.lit(0.0))
    return blocks.withColumn("num_words", n).withColumn("link_density", ld)


def boilerpipe_classify(
    blocks: DataFrame,
    id_col: str = "doc_id",
    order_col: str = "blk_no",
    num_words_col: str = "num_words",
    link_density_col: str = "link_density",
) -> DataFrame:
    """Apply the NumWordsRules tree to (id, blk_no, num_words,
    link_density) rows; adds ``is_content`` (1/0)."""
    w = Window.partitionBy(id_col).orderBy(order_col)
    curr_nw = F.col(num_words_col)
    curr_ld = F.col(link_density_col)
    prev_nw = F.lag(curr_nw, 1, 0).over(w)
    next_nw = F.lead(curr_nw, 1, 0).over(w)
    prev_ld = F.lag(curr_ld, 1, 0.0).over(w)

    content = F.when(curr_ld > MAX_LINK_DENSITY_CURR, F.lit(0)).otherwise(
        F.when(
            prev_ld <= MAX_LINK_DENSITY_PREV,
            F.when(
                curr_nw <= 16,
                F.when(
                    next_nw <= 15,
                    F.when(prev_nw <= 4, F.lit(0)).otherwise(F.lit(1)),
                ).otherwise(F.lit(1)),
            ).otherwise(F.lit(1)),
        ).otherwise(
            F.when(
                curr_nw <= 40,
                F.when(next_nw <= 17, F.lit(0)).otherwise(F.lit(1)),
            ).otherwise(F.lit(1))
        )
    )
    return blocks.withColumn("is_content", content)


def boilerpipe_extract(
    blocks: DataFrame,
    id_col: str = "doc_id",
    order_col: str = "blk_no",
    text_col: str = "text",
    link_words_col: str = "link_words",
) -> DataFrame:
    """The applied pass over raw text blocks: derive features, classify,
    and report per document (id, n_blocks, n_content, content_md5) —
    md5 over the surviving block texts in page order (md5('') when the
    page is all boilerplate). The summary groupBy keys on the same
    doc_id the window already shuffled on."""
    cls = boilerpipe_classify(
        text_blocks(blocks, text_col, link_words_col), id_col, order_col
    )
    return cls.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum(F.col("is_content").cast("long")).alias("n_content"),
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("is_content") == 1,
                                F.struct(F.col(order_col), F.col(text_col)),
                            )
                        )
                    ),
                    lambda x: x[text_col],
                ),
            )
        ).alias("content_md5"),
    )
