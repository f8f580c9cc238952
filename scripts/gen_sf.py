#!/usr/bin/env python
"""Scale-fixture generator (VERDICT r10 #1): build an sfN corpus by
tiling the driver's read-only sf0.1 corpus K times with key-space
offsets, so the full 215-query oracle gate and bench can run on
genuinely 10x (or 100x) data.

Why tiling, not re-synthesis: the driver's generator is not in this
repo, and the oracle gate compares Spark vs DuckDB on the SAME files —
internal consistency is what matters, not matching a hypothetical
driver sf1.  Tiling preserves every distribution the queries exercise
(value domains, group cardinalities per key, null patterns, time range)
while scaling row counts and key cardinalities linearly, exactly the
shape a 10x production corpus has.

Per-table rules (tile i of K; tile 0 is byte-identical to the source,
so every fixed-id probe list in the registry keeps resolving):

* region/nation — TPC-H fixed dimensions, copied once, never tiled.
* customer/supplier/part/orders/lineitem — primary and foreign keys
  offset by ``i * base_cardinality`` so referential integrity holds
  WITHIN each tile and key cardinality grows linearly; key-derived
  name columns (``Customer#...``) are regenerated from the new key.
* events — event_id/user_id offset; ``ts`` untouched, so the 30-day
  window densifies 10x (streaming state per window grows with rate,
  which is the scale axis the streaming queries must survive).
* documents — doc_id offset; tile>0 text gets a content-keyed word
  rewrite (see :func:`_rewrite_text`), which breaks CROSS-tile
  near-duplicate pairs under EVERY detector axis this engine ships
  (unigram SimHash votes, w-shingle MinHash/winnowing, 8-gram
  substring runs) while preserving the WITHIN-tile dup structure —
  without this, every doc gains K-1 near clones and pair volume grows
  K^2, a data artifact that would masquerade as a super-linear engine
  defect.  n_chars is recomputed.
* embeddings — vec_id offset; tile>0 vectors get a deterministic
  seeded float32 jitter (sigma 0.02) so ANN/SemDeDup neighborhoods
  densify instead of collapsing onto K-fold exact copies.

Output parquet mirrors the source physical schema (snappy, us
timestamps, float32 list embeddings) but uses bounded row groups
(ROW_GROUP_ROWS) so row-group pruning has something to prune at scale.

Usage: python scripts/gen_sf.py [K] [SRC_DIR] [OUT_DIR]
Defaults: 10 /root/testdata/sf0.1 <repo>/.localdata/sf1
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ROW_GROUP_ROWS = 262_144
# (table, {column: parent_base_table}) — which base cardinality offsets
# each key column.  Parent 'self' means the table's own row count.
KEYED = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "__user_domain__"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
NAME_COLS = {  # key-derived label columns regenerated from the new key
    "customer": ("c_name", "Customer#{:09d}", "c_custkey"),
    "supplier": ("s_name", "Supplier#{:09d}", "s_suppkey"),
}


def _cardinalities(src: str) -> dict[str, int]:
    card = {}
    for t in KEYED:
        card[t] = pq.read_metadata(os.path.join(src, f"{t}.parquet")).num_rows
    ev = pq.read_table(os.path.join(src, "events.parquet"), columns=["user_id"])
    card["__user_domain__"] = int(ev.column("user_id").to_numpy().max()) + 1
    return card


def _rewrite_text(texts, tile: int):
    """Tile-unique CONTENT-KEYED word rewrite: word ``w`` gains a
    ``q{tile}`` suffix when ``crc32(f"{tile}:{w}")`` selects it — about
    two-thirds of the vocabulary (crc32 % 3 != 0), a DIFFERENT
    two-thirds per tile.

    Why content-keyed replacement and not a woven salt token (the v1
    design, fixed in round 11): a constant token repeated every 4 words
    becomes ~20% of every doc's token stream, and any UNIGRAM-weighted
    feature extractor (SimHash's per-token majority vote) gets swamped —
    every tile>0 doc's signature collapsed toward the salt hash,
    manufacturing ~1.1M bogus within-tile near-dup pairs per tile at
    sf1 (measured: 1,493 pairs at sf0.1 -> 9.96M at sf1, 99.98% of
    them intra-tile).  The rewrite instead:

    * is a pure function of (word, tile), so any two docs transform
      identically WITHIN a tile — exact-dup, shingle-overlap and
      fingerprint structure is isomorphic to the base corpus (token-
      level overlap ratios are preserved exactly);
    * rewrites 2/3 of the vocabulary per tile, so cross-tile UNIGRAM
      overlap is ~1/3 vs tile 0 and ~1/9 between two rewritten tiles —
      SimHash cosine ≤ 0.33, expected Hamming ≈ 23 of 60 bits, far
      above any near-dup threshold;
    * kills cross-tile w-shingle overlap (a 3-gram survives with
      p ≈ (1/3)^3) and 8-gram substring runs ((1/3)^8) — the MinHash/
      winnowing/ExactSubstr axes the v1 salt was built for."""
    import zlib

    keep: dict[str, str] = {}

    def xf(w: str) -> str:
        r = keep.get(w)
        if r is None:
            r = w + f"q{tile}" if (
                zlib.crc32(f"{tile}:{w}".encode()) % 3
            ) else w
            keep[w] = r
        return r

    return [" ".join(xf(w) for w in s.split(" ")) for s in texts]


def _tile_table(src_tbl: pa.Table, name: str, tile: int,
                card: dict[str, int]) -> pa.Table:
    if tile == 0:
        return src_tbl
    cols = {}
    for field in src_tbl.schema:
        cols[field.name] = src_tbl.column(field.name)
    for col, parent in KEYED.get(name, {}).items():
        off = tile * card[parent]
        arr = src_tbl.column(col).to_numpy() + off
        cols[col] = pa.array(arr, type=src_tbl.schema.field(col).type)
    if name in NAME_COLS:
        ncol, fmt, key = NAME_COLS[name]
        keys = cols[key].to_numpy() if hasattr(cols[key], "to_numpy") \
            else np.asarray(cols[key])
        cols[ncol] = pa.array([fmt.format(int(k)) for k in keys],
                              type=pa.string())
    if name == "documents":
        texts = _rewrite_text(src_tbl.column("text").to_pylist(), tile)
        cols["text"] = pa.array(texts, type=pa.string())
        cols["n_chars"] = pa.array([len(t) for t in texts], type=pa.int64())
    if name == "embeddings":
        rng = np.random.default_rng(42_000 + tile)
        mat = np.stack(
            [np.asarray(v, dtype=np.float32)
             for v in src_tbl.column("embedding").to_pylist()]
        )
        mat = (mat + rng.normal(0.0, 0.02, mat.shape)).astype(np.float32)
        cols["embedding"] = pa.array(
            [row for row in mat.tolist()], type=pa.list_(pa.float32())
        )
    return pa.table(
        {f.name: cols[f.name] for f in src_tbl.schema},
        schema=pa.schema([src_tbl.schema.field(i)
                          for i in range(len(src_tbl.schema))]),
    )


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        repo, ".localdata", "sf1"
    )
    os.makedirs(out, exist_ok=True)
    card = _cardinalities(src)
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        src_tbl = pq.read_table(os.path.join(src, f"{t}.parquet"))
        # strip the source's pandas metadata — it describes the original
        # frame, not the tiled one
        src_tbl = src_tbl.replace_schema_metadata(None)
        tiles = [src_tbl] if t in ("region", "nation") else [
            _tile_table(src_tbl, t, i, card) for i in range(k)
        ]
        full = pa.concat_tables(tiles)
        dst = os.path.join(out, f"{t}.parquet")
        pq.write_table(full, dst, compression="snappy",
                       row_group_size=ROW_GROUP_ROWS)
        print(f"{t}: {src_tbl.num_rows} -> {full.num_rows} rows "
              f"({os.path.getsize(dst) >> 20} MiB)")
    print(f"done: {out}")


if __name__ == "__main__":
    main()
