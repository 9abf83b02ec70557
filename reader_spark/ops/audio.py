"""Audio near-duplicate detection: Haitsma-Kalker fingerprints over decoded
band-energy frames + banded-pigeonhole candidate join.

Reference parity: the reference treats audio attachments as opaque payloads
(media_ref spans); near-dup of re-encoded audio is the training-pipeline
extension (same role as ops/multimodal.py's image average-hash). Algorithm
from Haitsma & Kalker, "A Highly Robust Audio Fingerprinting System"
(ISMIR 2002): the fingerprint bit for (frame f, band b) is the sign of the
energy difference along both time and band,

    bit(f, b) = [ E(f,b) - E(f,b-1) - (E(f-1,b) - E(f-1,b-1)) ] > 0

which is invariant to volume scaling and slow spectral tilt — exactly what
survives re-encoding. The decoder (PCM -> windowed FFT -> log-spaced band
energies) is the stubbed modality step in this container (no audio libs);
the op takes the decoder's OUTPUT shape: one array<array<double>> of
n_frames x n_bands energies per clip, the same contract extract_image_
features uses for thumbnails.

Scale shape: fingerprinting is a per-row map (no shuffle). Candidates come
from a (band_id, band_value) equi-join — LOSSLESS for <= max_mismatch
differing frame-hashes by pigeonhole: max_mismatch+1 consecutive-chunk
bands mean at most max_mismatch of them can be touched, so one matches
(Manku et al., WWW 2007, block-permuted Hamming search — same argument as
ops/dedup.simhash_banded). Only (id, fingerprint) rows shuffle, keyed by
band value; no all-pairs product anywhere. The exact positional-mismatch
check then keeps true pairs, so banding never changes the result set.

Everything is column-native (element_at / aggregate / transform / zip_with
folds — no Python in the hot path) and engine-portable: the bit threshold
is a sign of a double sum/difference chain, bit-identical in any IEEE-754
engine, which is what lets the DuckDB oracle replicate the fingerprint.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["hk_fingerprint", "audio_neardup"]


def hk_fingerprint(frames: Column, n_frames: int, n_bands: int) -> Column:
    """Haitsma-Kalker fingerprint of an n_frames x n_bands energy matrix
    (array<array<double>>, decoder output): array<long> of n_frames-1
    frame-hashes, each packing n_bands-1 sign bits MSB-first via the same
    shift-free acc*2+bit fold as multimodal.avg_hash_cols."""
    if n_frames < 2 or n_bands < 2:
        raise ValueError(
            f"need n_frames, n_bands >= 2, got {n_frames}x{n_bands}"
        )

    def energy(f: Column, b: Column) -> Column:
        # f, b are 0-based; element_at is 1-based
        return F.element_at(F.element_at(frames, f + 1), b + 1)

    def frame_hash(f: Column) -> Column:
        return F.aggregate(
            F.sequence(F.lit(1), F.lit(n_bands - 1)),
            F.lit(0).cast("long"),
            lambda acc, b: acc * 2
            + F.when(
                energy(f, b)
                - energy(f, b - 1)
                - energy(f - 1, b)
                + energy(f - 1, b - 1)
                > 0,
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .cast("long"),
        )

    return F.transform(
        F.sequence(F.lit(1), F.lit(n_frames - 1)), lambda f: frame_hash(f)
    )


def audio_neardup(
    clips: DataFrame,
    id_col: str = "media_id",
    frames_col: str = "frames",
    n_frames: int = 8,
    n_bands: int = 8,
    max_mismatch: int = 1,
) -> DataFrame:
    """Near-duplicate clip pairs: (id_a, id_b, n_mismatch), id_a < id_b,
    where n_mismatch = number of fingerprint frame-hash positions that
    differ, kept when <= max_mismatch.

    Candidate generation is the lossless banded equi-join described in the
    module doc; max_mismatch+1 bands each need >= 1 frame-hash, so
    max_mismatch is capped at n_frames-2.
    """
    n_fp = n_frames - 1
    if not 0 <= max_mismatch <= n_fp - 1:
        raise ValueError(
            f"max_mismatch must be in [0, {n_fp - 1}] for {n_frames} frames "
            f"(each of the max_mismatch+1 pigeonhole bands needs a "
            f"frame-hash), got {max_mismatch}"
        )
    n_b = max_mismatch + 1

    fp = clips.select(
        F.col(id_col).alias("__id"),
        hk_fingerprint(F.col(frames_col), n_frames, n_bands).alias("__fp"),
    )
    # consecutive-chunk bands: band k = fp[floor(k*L/B) .. floor((k+1)*L/B))
    band_structs = []
    for k in range(n_b):
        start = k * n_fp // n_b
        length = (k + 1) * n_fp // n_b - start
        band_structs.append(
            F.struct(
                F.lit(k).alias("bk"),
                # string band value: portable equi-join key (array equality
                # semantics differ across engines; a joined string doesn't)
                F.concat_ws(
                    "-",
                    F.transform(
                        F.slice("__fp", start + 1, length),
                        lambda x: x.cast("string"),
                    ),
                ).alias("bv"),
            )
        )
    bands = fp.select(
        "__id", "__fp", F.explode(F.array(*band_structs)).alias("b")
    ).select("__id", "__fp", "b.bk", "b.bv")

    a, b = bands.alias("a"), bands.alias("b")
    mismatch = F.aggregate(
        F.zip_with(
            F.col("a.__fp"),
            F.col("b.__fp"),
            lambda x, y: F.when(x == y, F.lit(0)).otherwise(F.lit(1)),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return (
        a.join(
            b,
            (F.col("a.bk") == F.col("b.bk"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            mismatch.cast("int").alias("n_mismatch"),
        )
        .where(F.col("n_mismatch") <= max_mismatch)
        .distinct()
    )
