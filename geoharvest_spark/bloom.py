"""Deterministic Bloom-filter build + scan-side join pruning.

The 100-TB shuffle-avoidance primitive: when a big fact table joins a
selective dimension, shipping every fact row to the shuffle is the cost.
A Bloom filter built from the dim keys and evaluated AT THE SCAN drops
the overwhelming majority of fact rows before they ever reach the join
exchange (Spark's own AQE runtime filters do this opportunistically;
this operator makes it explicit, deterministic, and oracle-checkable).

Design (every piece SQL-replayable):

- hash: the engine-wide md5-60-bit idiom; k probe positions by
  Kirsch-Mitzenmacher double hashing pos_i = (h + i*h2) mod m with
  h2 = (h >> 29) | 1 (odd, so probes cycle the whole table);
- the bitset is built EITHER distributed (explode k positions ->
  groupBy(byte) bit_or — one tiny shuffle of <= k rows/key) or in pure
  Python (the oracle twin); both must produce byte-identical bitsets
  (tested + witnessed by the driver oracle's pass-count);
- the filter is a HEX-STRING LITERAL in the plan: might_contain is
  conv(substr(hex, byte*2+1, 2),16,10) >> bit & 1 — whole-stage
  codegen, O(1) per probe, zero Python, and the exact same expression
  runs in DuckDB. Sizing contract: m bits -> m/4 hex chars in the plan;
  keep m <= 2^22 (1 MB literal) — beyond that, ship the filter as a
  broadcast table instead.

False positives are BY DESIGN passed to the exact join that follows —
the operator contract is "prefilter, never final answer" — so results
equal the plain join bit-for-bit while the scan output shrinks by the
measured pruning ratio (both facts oracle-checked in bloom_semi_prune's
driver query: n_pass vs n_true).

The per-filter driver collect is the engine's shared-config pattern
(IVF centroids, BPE merge tables): a fixed-size sketch, never data.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _h60(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def _bit_masks() -> Column:
    # built lazily — Column construction requires an active session
    return F.array(*[F.lit(1 << b).cast("long") for b in range(8)])


def bloom_build(df: DataFrame, key_col: str, m_bits: int = 1 << 15, k: int = 3) -> str:
    """Build the bitset distributed; return it as a lowercase hex string
    (2 chars per byte, byte 0 first, LSB-first bits within a byte)."""
    if m_bits % 8 or not 64 <= m_bits <= 1 << 22:
        raise ValueError(f"m_bits must be a multiple of 8 in [64, 2^22], got {m_bits}")
    if not 1 <= k <= 16:
        raise ValueError(f"k must be in [1, 16], got {k}")
    h = _h60(F.col(key_col))
    h2 = F.shiftrightunsigned(h, 29).bitwiseOR(F.lit(1))
    pos = F.explode(
        F.array(*[(h + F.lit(i) * h2) % F.lit(m_bits) for i in range(k)])
    ).alias("pos")
    rows = (
        df.where(F.col(key_col).isNotNull())
        .select(pos)
        .select(
            F.shiftrightunsigned(F.col("pos"), 3).alias("byte_idx"),
            # variable shifts need literal amounts in the Column API —
            # an 8-way mask lookup is codegen and equivalent
            F.element_at(
                _bit_masks(),
                (F.col("pos").bitwiseAND(F.lit(7)) + 1).cast("int"),
            ).alias("mask"),
        )
        .groupBy("byte_idx")
        .agg(F.bit_or("mask").alias("val"))
        .collect()
    )
    buf = np.zeros(m_bits // 8, dtype=np.uint8)
    for r in rows:
        buf[r["byte_idx"]] = r["val"]
    return bytes(buf).hex()


def bloom_build_py(keys, m_bits: int = 1 << 15, k: int = 3) -> str:
    """Pure-Python twin (no Spark) — the oracle-staging path. Must be
    byte-identical to bloom_build on the same keys."""
    buf = np.zeros(m_bits // 8, dtype=np.uint8)
    for key in keys:
        if key is None:
            continue
        h = int(hashlib.md5(str(key).encode()).hexdigest()[:15], 16)
        h2 = (h >> 29) | 1
        for i in range(k):
            pos = (h + i * h2) % m_bits
            buf[pos >> 3] |= 1 << (pos & 7)
    return bytes(buf).hex()


def bloom_might_contain(
    col: Column, hex_filter: str, m_bits: int, k: int = 3
) -> Column:
    """Codegen membership probe against the hex-literal bitset. No false
    negatives; false-positive rate ~ (k*n/m)^k."""
    h = _h60(col)
    h2 = F.shiftrightunsigned(h, 29).bitwiseOR(F.lit(1))
    lit = F.lit(hex_filter)
    out = F.lit(True)
    for i in range(k):
        pos = (h + F.lit(i) * h2) % F.lit(m_bits)
        byte_val = F.conv(
            lit.substr(
                (F.shiftrightunsigned(pos, 3) * 2 + 1).cast("int"), F.lit(2)
            ),
            16,
            10,
        ).cast("long")
        mask = F.element_at(
            _bit_masks(), (pos.bitwiseAND(F.lit(7)) + 1).cast("int")
        )
        out = out & (byte_val.bitwiseAND(mask) != 0)
    return out


def bloom_sql_probe(val_expr: str, hex_filter: str, m_bits: int, k: int = 3) -> str:
    """The identical probe as a DuckDB boolean expression (oracle twin)."""
    h = f"('0x' || substr(md5(CAST({val_expr} AS VARCHAR)), 1, 15))::BIGINT"
    terms = []
    for i in range(k):
        pos = f"(({h}) + {i} * ((({h}) >> 29) | 1)) % {m_bits}"
        byte_val = (
            f"('0x' || substr('{hex_filter}', "
            f"CAST((({pos}) >> 3) * 2 + 1 AS INTEGER), 2))::BIGINT"
        )
        terms.append(f"(((({byte_val}) >> CAST(({pos}) & 7 AS INTEGER)) & 1) = 1)")
    return "(" + " AND ".join(terms) + ")"


def bloom_prune(
    df: DataFrame,
    key_col: str,
    dim: DataFrame,
    dim_key: str,
    m_bits: int = 1 << 15,
    k: int = 3,
) -> DataFrame:
    """Scan-side prefilter: keep df rows whose key might be in dim's key
    set. ALWAYS follow with the exact join — false positives survive
    this stage by design."""
    hx = bloom_build(dim, dim_key, m_bits, k)
    return df.where(bloom_might_contain(F.col(key_col), hx, m_bits, k))
