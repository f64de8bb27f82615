"""Build a local sf1-scale dataset by replicating sf0.1 with key offsets.

The driver ships sf0.001/0.01/0.1 only; VERDICT r6 asks for an sf1
scale-proportionality spot check.  This tool writes
``/root/repo/.localdata/sf1/*.parquet`` (gitignored) as 10 key-shifted
replicas of ``/root/testdata/sf0.1``:

- every key domain gets its own round offset (``replica * 10^k`` with
  ``10^k > max key``), applied consistently on both sides of each FK
  (orders.o_custkey moves with customer.c_custkey, lineitem's three FKs
  move with orders/part/supplier), so joins keep TPC-H-ish selectivity;
- ``region``/``nation`` stay fixed — they are bounded dimensions and
  customer/supplier keep referencing them;
- ``documents.text`` gets a per-TOKEN ``r{i}`` prefix for replicas > 0
  (a per-replica token bijection) so exact/near-dup structure is
  preserved WITHIN a replica instead of turning the corpus into 90%
  cross-replica duplicates;
- ``embeddings.embedding`` gets its dimensions rolled by the replica
  index AND sign-flipped by a per-replica bijective bit pattern (both
  orthogonal: within-replica geometry is exactly preserved,
  cross-replica cosines drop to noise) — otherwise every vector would
  have 10 exact copies and cell/bucket-bounded ANN and semantic-dedup
  plans would see an artificial quadratic pair blowup a real 10x
  dataset does not have. The sign flips exist because the roll alone
  is the IDENTITY whenever ``i % dim == 0``, so a REPLICAS >= dim+1
  run (or a lower-dim embeddings table) would silently reintroduce
  exact cross-replica copies;
- timestamps are left unchanged: the time range keeps sf0.1's span at
  10x density, which is what a bigger cluster sees per day anyway.

Pure pyarrow — no Spark session, so it can run next to other jobs.
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = os.environ.get("SF1_SRC", "/root/testdata/sf0.1")
DST = os.environ.get("SF1_DST", "/root/repo/.localdata/sf1")
REPLICAS = int(os.environ.get("SF1_REPLICAS", "10"))

# key-domain offsets: one round power of ten per domain, safely above
# the sf0.1 max key so replica ranges never collide
OFF = {
    "cust": 10**6,   # max c_custkey 15k
    "ord": 10**7,    # max o_orderkey ~600k
    "part": 10**6,   # 20k parts
    "supp": 10**5,   # 1k suppliers
    "event": 10**7,  # 100k events
    "user": 10**6,
    "doc": 10**6,
    "vec": 10**5,
}

# table -> [(column, domain)]
SHIFTS = {
    "customer": [("c_custkey", "cust")],
    "orders": [("o_orderkey", "ord"), ("o_custkey", "cust")],
    "lineitem": [
        ("l_orderkey", "ord"),
        ("l_partkey", "part"),
        ("l_suppkey", "supp"),
    ],
    "part": [("p_partkey", "part")],
    "supplier": [("s_suppkey", "supp")],
    "events": [("event_id", "event"), ("user_id", "user")],
    "documents": [("doc_id", "doc")],
    "embeddings": [("vec_id", "vec")],
    "region": [],
    "nation": [],
}


_PHI = 2654435761  # Knuth multiplicative hash; odd -> bijective mod 2^32


def _replica_signs(i: int, dim: int) -> "np.ndarray":
    """Per-replica deterministic ±1 diagonal. The pattern reads the
    low min(dim, 32) bits of a bijective-mod-2^32 hash, so two
    replicas share a pattern only when their indices agree mod
    2^min(dim, 32) — the composite roll∘signs transform is therefore
    never the identity for i != k as long as both are below that
    bound (e.g. dim=8 supports 256 replicas; dim>=32 supports 2^32).
    Raising beyond the bound would silently reintroduce cross-replica
    exact copies, so it is an error instead."""
    limit = 2 ** min(dim, 32)
    if i >= limit:
        raise ValueError(
            f"replica index {i} >= 2^min(dim,32) = {limit}: sign "
            f"patterns would repeat and replicas would collide; use a "
            f"higher-dim embedding table or fewer replicas"
        )
    h = (i * _PHI) & 0xFFFFFFFF
    return np.array(
        [-1.0 if (h >> (j % 32)) & 1 else 1.0 for j in range(dim)],
        dtype=np.float32,
    )


def _transform_embeddings(mat: "np.ndarray", i: int) -> "np.ndarray":
    """Replica-i orthogonal transform: roll the dimensions by i, then
    flip signs by the replica's bit pattern. Both factors are
    orthogonal and diagonal-or-permutation, so within-replica inner
    products (hence cosines, norms, and every distance) are exactly
    preserved while cross-replica similarity drops to noise."""
    if i == 0:
        return mat
    rolled = np.roll(mat, i % mat.shape[1], axis=1)
    return rolled * _replica_signs(i, mat.shape[1])


def replicate(name: str) -> None:
    src = f"{SRC}/{name}.parquet"
    dst = f"{DST}/{name}.parquet"
    base = pq.read_table(src)
    shifts = SHIFTS[name]
    if not shifts:  # fixed dimension: copy once
        pq.write_table(base, dst, compression="zstd")
        print(f"{name}: {base.num_rows} rows (copied)")
        return
    out = pq.ParquetWriter(dst, base.schema, compression="zstd")
    for i in range(REPLICAS):
        t = base
        for col, dom in shifts:
            idx = t.schema.get_field_index(col)
            shifted = pc.add(t.column(col), pa.scalar(i * OFF[dom], t.schema.field(col).type))
            t = t.set_column(idx, t.schema.field(col), shifted)
        if name == "embeddings" and i > 0:
            idx = t.schema.get_field_index("embedding")
            col = t.column("embedding").combine_chunks()
            mat = np.asarray(col.to_pylist(), dtype=np.float32)
            arr = pa.array(list(_transform_embeddings(mat, i)), pa.list_(pa.float32()))
            t = t.set_column(idx, t.schema.field("embedding"), arr)
        if name == "documents" and i > 0:
            # per-replica TOKEN BIJECTION: prefix every word with r{i},
            # so replica i's vocabulary is disjoint from replica j's.
            # Within-replica token/shingle/minhash structure is
            # preserved exactly (1:1 token map), while NO content key —
            # rare-token PPJoin prefixes, minhash bands, simhash bands,
            # exact digests — can bucket documents across replicas.
            # Anything weaker leaves shared rare tokens between a doc
            # and its 9 copies, inflating every candidate bucket 10x
            # and pair counts 100x: quadratic harness artifact, not
            # operator behavior (a real 10x corpus adds NEW documents,
            # not 9 shadows of each existing one).
            idx = t.schema.get_field_index("text")
            marked = pc.replace_substring_regex(
                t.column("text").cast(pa.string()),
                pattern=r"(\S+)",
                replacement=f"r{i}\\1",
            )
            t = t.set_column(idx, t.schema.field("text"), marked)
            nidx = t.schema.get_field_index("n_chars")
            t = t.set_column(
                nidx,
                t.schema.field("n_chars"),
                pc.cast(
                    pc.utf8_length(t.column(idx).cast(pa.string())), pa.int64()
                ),
            )
        out.write_table(t)
    out.close()
    n = pq.read_metadata(dst).num_rows
    print(f"{name}: {n} rows ({REPLICAS} replicas)")


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    for name in SHIFTS:
        replicate(name)
    print(f"done -> {DST}")


if __name__ == "__main__":
    main()
