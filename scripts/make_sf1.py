"""Generate a LOCAL sf1 validation tier (10x sf0.1) for ramp checks.

The driver fixtures stop at sf0.1; VERDICT r15 item 4 asks for one
measured decade further out. The driver's generator is not available,
so this builds sf1 by REPLICA-SHIFTING the committed sf0.1 parquet 10x:
every replica remaps entity keys by a per-table offset (max key + 1) so
joins stay consistent and the copurchase graph becomes 10 disjoint
copies of the sf0.1 graph (degree distribution, dmax, and per-component
structure preserved exactly — sum(deg^2) scales linearly, the property
the wedge/triangle ramps are measured against).

Two shape-preserving perturbations stop replicas from colliding where
IDENTITY would distort the workload:

- documents.text for replica i>0 gets a replica token spliced in every
  8 words (the shingle width), so NO 8-gram shingle survives across
  replicas: without this, every sf0.1 doc acquires 10 exact/near
  copies and the banded dedup keys would measure a C(10,2) pair
  blow-up, not a 10x data ramp. Within-replica dup structure is
  untouched (identical docs get identical salts). n_chars is
  recomputed to stay consistent with the salted text.
- embeddings.embedding for replica i rotates its dimensions by i*7:
  distribution and norms survive, but cross-replica cosine collapses
  to noise — without this the ANN keys would see every vector 10x
  duplicated (an artificial all-pairs magnet), same argument.

This is an honest LOCAL fixture, not driver data: ramp rows derived
from it are labeled `sf1 (replica-shifted)` in SCALE.md.

Usage: python scripts/make_sf1.py [out_dir]   (default .localdata/sf1)
"""
from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, ".localdata", "sf1")
REPLICAS = 10
SHINGLE_W = 8  # must match llm.dedup's shingle width


def _offset(tbl: pa.Table, col: str) -> int:
    return pc.max(tbl[col]).as_py() + 1


def _shift(tbl: pa.Table, col: str, off: int, i: int) -> pa.Table:
    idx = tbl.schema.get_field_index(col)
    typ = tbl.schema.field(idx).type
    shifted = pc.cast(pc.add(tbl[col], pa.scalar(off * i, type=typ)), typ)
    return tbl.set_column(idx, tbl.schema.field(idx), shifted)


def _salt_text(text: str, i: int) -> str:
    """Splice a replica token after every SHINGLE_W-th word: every
    8-gram window then contains >= 1 replica-specific token, so no
    shingle is shared across replicas, while within-replica equality
    is preserved (same text -> same salted text)."""
    if text is None:
        return None
    words = text.split(" ")
    tok = f"sf1r{i}x"
    out = []
    for j, w in enumerate(words):
        out.append(w)
        if (j + 1) % SHINGLE_W == 0:
            out.append(tok)
    return " ".join(out)


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    tables = {
        n: pq.read_table(os.path.join(SRC, f"{n}.parquet"))
        for n in (
            "region nation customer supplier part orders lineitem "
            "events documents embeddings"
        ).split()
    }
    off = {
        "cust": _offset(tables["customer"], "c_custkey"),
        "supp": _offset(tables["supplier"], "s_suppkey"),
        "part": _offset(tables["part"], "p_partkey"),
        "order": _offset(tables["orders"], "o_orderkey"),
        "event": _offset(tables["events"], "event_id"),
        "user": _offset(tables["events"], "user_id"),
        "doc": _offset(tables["documents"], "doc_id"),
        "vec": _offset(tables["embeddings"], "vec_id"),
    }

    # dimension tables are scale-invariant: copy verbatim
    for n in ("region", "nation"):
        pq.write_table(tables[n], os.path.join(OUT, f"{n}.parquet"))
        print(f"{n}: copied ({tables[n].num_rows} rows)")

    shift_cols = {
        "customer": [("c_custkey", "cust")],
        "supplier": [("s_suppkey", "supp")],
        "part": [("p_partkey", "part")],
        "orders": [("o_orderkey", "order"), ("o_custkey", "cust")],
        "lineitem": [
            ("l_orderkey", "order"),
            ("l_partkey", "part"),
            ("l_suppkey", "supp"),
        ],
        "events": [("event_id", "event"), ("user_id", "user")],
        "documents": [("doc_id", "doc")],
        "embeddings": [("vec_id", "vec")],
    }

    for name, cols in shift_cols.items():
        src = tables[name]
        parts = []
        for i in range(REPLICAS):
            t = src
            for col, key in cols:
                t = _shift(t, col, off[key], i)
            if name == "documents" and i > 0:
                texts = [_salt_text(v, i) for v in t["text"].to_pylist()]
                tarr = pa.array(texts, type=pa.string())
                ti = t.schema.get_field_index("text")
                t = t.set_column(ti, t.schema.field(ti), tarr)
                ni = t.schema.get_field_index("n_chars")
                nchars = pa.array(
                    [None if v is None else len(v) for v in texts],
                    type=t.schema.field(ni).type,
                )
                t = t.set_column(ni, t.schema.field(ni), nchars)
            if name == "embeddings" and i > 0:
                vecs = t["embedding"].to_pylist()
                rot = (i * 7) % (len(vecs[0]) if vecs and vecs[0] else 1)
                rolled = [
                    None if v is None else v[rot:] + v[:rot] for v in vecs
                ]
                ei = t.schema.get_field_index("embedding")
                t = t.set_column(
                    ei,
                    t.schema.field(ei),
                    pa.array(rolled, type=t.schema.field(ei).type),
                )
            parts.append(t)
        out = pa.concat_tables(parts)
        pq.write_table(out, os.path.join(OUT, f"{name}.parquet"))
        print(f"{name}: {src.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    main()
