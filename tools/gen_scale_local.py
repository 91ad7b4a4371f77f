"""Generate a LOCAL scaled copy of a testdata sf directory for profiling.

Measurement-only tooling (guide §1): the round driver generates its own
large-sf data; this tool exists so optimization work can be profiled at
driver scale locally after a sandbox reset. It is never imported by
bench.py or any query path, and its output lives OUTSIDE the repo.

Tiling rules (K replicas of sf0.1 ~ driver sf1.0):

* ``events``: ``event_id += r*E_BASE`` with ``E_BASE % 35 == 0`` so the
  ``% 7`` (tool) and ``% 5`` (states) derivations keep the same hit rate;
  ``user_id += r*U_BASE`` so conversation count scales 10x with the same
  per-conversation size distribution (matches how the driver's sf scaling
  behaves: users ~ sf, turns/user constant).
* ``documents``: ``doc_id += r*D_BASE`` with ``D_BASE % 10 == 0`` (the
  ``% 10`` planted-dup structure survives). For r>0 every WORD gets a
  ``~r`` suffix: word counts, shingle counts and within-replica dup
  structure are identical, while cross-replica shingle/simhash overlap is
  destroyed — otherwise every doc would near-match its K-1 siblings and
  pair output would grow K^2, which the driver's generator does not do.
* ``embeddings``: ``vec_id += r*V_BASE``; r>0 vectors get a deterministic
  dimension roll + alternating sign flip (norms preserved, cross-replica
  cosine decorrelated). Queries (``vec_id < NQ``) stay replica-0 only, so
  the O(queries) broadcast side is fixed while the corpus scales.
* TPC-H tables: key columns shifted per replica consistently across
  fact/dimension so join fan-out per key is unchanged.

Usage::

    python tools/gen_scale_local.py [--src /root/testdata/sf0.1] \
        [--out /root/bench_sf1.0] [--k 10]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

E_BASE = 10_500_000       # % 35 == 0
U_BASE = 1_000_000
D_BASE = 1_000_000        # % 10 == 0
V_BASE = 1_000_000
O_BASE = 100_000_000
C_BASE = 10_000_000
P_BASE = 10_000_000
S_BASE = 1_000_000


def _shift(tbl: pa.Table, col: str, delta: int) -> pa.Table:
    i = tbl.schema.get_field_index(col)
    arr = pa.compute.add(tbl.column(i), delta)
    return tbl.set_column(i, tbl.schema.field(i), arr)


def _suffix_words(texts: pa.ChunkedArray, r: int) -> pa.Array:
    suf = f"~{r}"
    out = []
    for t in texts.to_pylist():
        if t is None:
            out.append(None)
        else:
            out.append(" ".join(w + suf for w in t.split()))
    return pa.array(out, type=pa.string())


def _perturb_vecs(col: pa.ChunkedArray, r: int) -> pa.Array:
    rows = col.to_pylist()
    out = []
    for v in rows:
        if v is None:
            out.append(None)
            continue
        a = np.asarray(v, dtype=np.float32)
        a = np.roll(a, r % max(len(a), 1))
        sgn = np.where((np.arange(len(a)) + r) % 2 == 0, 1.0, -1.0).astype(
            np.float32)
        out.append((a * sgn).tolist())
    return pa.array(out, type=pa.list_(pa.float32()))


def tile(src: str, out: str, k: int) -> None:
    os.makedirs(out, exist_ok=True)
    plans = {
        "events": {"event_id": E_BASE, "user_id": U_BASE},
        "documents": {"doc_id": D_BASE},
        "embeddings": {"vec_id": V_BASE},
        "lineitem": {"l_orderkey": O_BASE, "l_partkey": P_BASE,
                     "l_suppkey": S_BASE},
        "orders": {"o_orderkey": O_BASE, "o_custkey": C_BASE},
        "customer": {"c_custkey": C_BASE},
        "part": {"p_partkey": P_BASE},
        "supplier": {"s_suppkey": S_BASE},
        "nation": {},
        "region": {},
    }
    for name, shifts in plans.items():
        path = os.path.join(src, f"{name}.parquet")
        base = pq.read_table(path)
        reps = []
        for r in range(k if shifts else 1):
            t = base
            for col, delta in shifts.items():
                if r:
                    t = _shift(t, col, r * delta)
            if name == "documents" and r:
                i = t.schema.get_field_index("text")
                t = t.set_column(i, t.schema.field(i),
                                 _suffix_words(t.column(i), r))
            if name == "embeddings" and r:
                i = t.schema.get_field_index("embedding")
                t = t.set_column(i, t.schema.field(i),
                                 _perturb_vecs(t.column(i), r))
            reps.append(t)
        full = pa.concat_tables(reps)
        # default 1Mi-row groups, mirroring the driver's observed layout
        # (sf0.1 files are all one row group; the r06 sf1.0 lineitem had 6)
        pq.write_table(full, os.path.join(out, f"{name}.parquet"),
                       row_group_size=1 << 20)
        print(f"{name}: {base.num_rows} -> {full.num_rows} rows")
    open(os.path.join(out, "_DONE"), "w").close()


if __name__ == "__main__":
    def _arg(flag, default):
        return sys.argv[sys.argv.index(flag) + 1] if flag in sys.argv else default

    tile(_arg("--src", "/root/testdata/sf0.1"),
         _arg("--out", "/root/bench_sf1.0"), int(_arg("--k", "10")))
