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


def _probe_cols(h: Column, hex_col: Column, m_bits: int, k: int) -> Column:
    """Membership test given an already-staged hash column and an
    already-staged hex-string column (both plain column REFERENCES —
    never re-inlined per probe term)."""
    h2 = F.shiftrightunsigned(h, 29).bitwiseOR(F.lit(1))
    out = F.lit(True)
    for i in range(k):
        pos = (h + F.lit(i) * h2) % F.lit(m_bits)
        byte_val = F.conv(
            hex_col.substr(
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


def bloom_might_contain(
    col: Column, hex_filter: str, m_bits: int, k: int = 3
) -> Column:
    """Inline membership probe — SMALL filters only (m_bits <= ~2^15).

    INLINE-REUSE TRAP (measured): this Column embeds the hex literal
    AND the md5 hash expression once PER probe term — at m = 2^20 that
    is a megabyte-scale task binary and codegen blowout (the 4M-row
    probe leg ran minutes instead of sub-second). For big filters use
    bloom_filter_where, which stages both through projection aliases.
    """
    return _probe_cols(_h60(col), F.lit(hex_filter), m_bits, k)


def bloom_filter_where(
    df: DataFrame,
    key_col: str,
    hex_filter: str,
    m_bits: int,
    k: int = 3,
) -> DataFrame:
    """Scan-side prefilter safe at any filter size.

    Two measured traps shape this implementation:
    - the inline probe (bloom_might_contain) embeds the hex literal and
      the md5 expression once PER term — megabyte task binaries and
      codegen blowout at m = 2^20;
    - staging the hex through withColumn(lit(hex)) is WORSE: the
      projection materializes the 256 KB string INTO EVERY ROW.

    - substr on a 2^18-char STRING literal is O(position) per call
      (UTF8String re-resolves char offsets to byte offsets), ~150 us a
      row at m = 2^20; substring on a BINARY literal is byte-addressed
      O(1).

    The fix: the md5 hash is staged as a projection alias (8 bytes/row,
    evaluated once), the filter bitset is ONE binary literal, the k
    probe positions become an array, and the byte test runs inside ONE
    higher-order F.filter lambda — the literal appears exactly once in
    the plan, lambda evaluation just references it, and the row data
    never carries it."""
    h = F.col("_bloom_h")
    h2 = F.shiftrightunsigned(h, 29).bitwiseOR(F.lit(1))
    pos_arr = F.transform(
        F.sequence(F.lit(0).cast("long"), F.lit(k - 1).cast("long")),
        lambda i: (h + i * h2) % F.lit(m_bits),
    )
    lit_bin = F.lit(bytes.fromhex(hex_filter))

    def _hit(pos: Column) -> Column:
        byte_val = F.conv(
            F.hex(
                lit_bin.substr(
                    (F.shiftrightunsigned(pos, 3) + 1).cast("int"), F.lit(1)
                )
            ),
            16,
            10,
        ).cast("long")
        mask = F.element_at(
            _bit_masks(), (pos.bitwiseAND(F.lit(7)) + 1).cast("int")
        )
        return byte_val.bitwiseAND(mask) != 0

    keep = F.size(F.filter(pos_arr, _hit)) == k
    staged = df.withColumn("_bloom_h", _h60(F.col(key_col)))
    return staged.where(keep).drop("_bloom_h")


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
    return bloom_filter_where(df, key_col, hx, m_bits, k)
