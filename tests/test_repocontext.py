"""Repo-context rendering (ops/repocontext.py): path order, the
prefix budget rule, the file cap, render grammar."""

import pytest
from pyspark.sql import Row

from reader_spark.ops.repocontext import (
    FILE_TOK,
    REPO_TOK,
    repo_context_render,
)

pytestmark = pytest.mark.spark


def _f(repo, path, content):
    return Row(repo=repo, path=path, content=content)


@pytest.fixture(scope="module")
def files(spark):
    rows = [
        # small repo, fits fully; input order is NOT path order
        _f("r1", "src/b.py", "bbb"),
        _f("r1", "src/a.py", "aaa"),
        # straddler repo: file order a(small), b(big straddler),
        # c(small) — prefix rule drops b AND c even though c would fit
        _f("r2", "a.py", "x" * 10),
        _f("r2", "b.py", "y" * 500),
        _f("r2", "c.py", "z" * 10),
        # cap repo: 5 files, cap 3
        *[_f("r3", f"f{i}.py", "k") for i in range(5)],
    ]
    return spark.createDataFrame(rows)


def test_path_order_and_render(spark, files):
    got = {r["repo"]: r for r in
           repo_context_render(files, budget_chars=1000).collect()}
    r1 = got["r1"]
    assert r1["context"] == (
        f"{REPO_TOK}r1"
        f"{FILE_TOK}src/a.py\naaa"
        f"{FILE_TOK}src/b.py\nbbb"
    )
    assert r1["n_files"] == 2 and r1["n_files_rendered"] == 2
    assert r1["n_chars"] == len(r1["context"])


def test_prefix_budget_rule(spark, files):
    got = {r["repo"]: r for r in
           repo_context_render(files, budget_chars=60).collect()}
    r2 = got["r2"]
    # a.py renders (12+4+10+1=27 <= 60), b.py overflows -> stop; c.py
    # would fit but the prefix rule drops it too
    assert r2["n_files_rendered"] == 1
    assert "a.py" in r2["context"]
    assert "b.py" not in r2["context"] and "c.py" not in r2["context"]


def test_max_files_cap(spark, files):
    got = {r["repo"]: r for r in
           repo_context_render(files, budget_chars=10_000,
                               max_files=3).collect()}
    r3 = got["r3"]
    assert r3["n_files"] == 5 and r3["n_files_rendered"] == 3
    # cap keeps the path-sorted prefix
    assert "f0.py" in r3["context"] and "f2.py" in r3["context"]
    assert "f3.py" not in r3["context"]


def test_budget_bounds_sample_size(spark, files):
    for r in repo_context_render(files, budget_chars=100).collect():
        header = len(REPO_TOK) + len(r["repo"])
        assert r["n_chars"] <= 100 + header


def test_param_validation(spark, files):
    with pytest.raises(ValueError):
        repo_context_render(files, budget_chars=0)
    with pytest.raises(ValueError):
        repo_context_render(files, max_files=0)
