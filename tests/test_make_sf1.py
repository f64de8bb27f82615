"""Unit tests for tools/make_sf1.py — the local scale-up generator.

Pure pyarrow (no SparkSession): validates the invariants the sf1
scale spot check depends on — FK consistency across key-shifted
replicas, disjoint per-replica document vocabulary (so content keys
never bucket across replicas), and orthogonally-permuted embeddings
(within-replica geometry preserved exactly).
"""

import importlib
import os
import sys

import numpy as np
import pyarrow.parquet as pq
import pytest

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")


@pytest.fixture(scope="module")
def upscaled(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("sfup"))
    os.environ["SF1_SRC"] = "/root/testdata/sf0.001"
    os.environ["SF1_DST"] = dst
    os.environ["SF1_REPLICAS"] = "2"
    sys.path.insert(0, TOOLS)
    try:
        import make_sf1
        importlib.reload(make_sf1)  # pick up the env overrides
        make_sf1.main()
    finally:
        sys.path.remove(TOOLS)
        for k in ("SF1_SRC", "SF1_DST", "SF1_REPLICAS"):
            os.environ.pop(k, None)
    return dst


def _col(dst, table, col):
    return pq.read_table(f"{dst}/{table}.parquet", columns=[col]).column(col)


def test_row_counts_scale(upscaled):
    for t in ("customer", "orders", "lineitem", "documents", "embeddings"):
        n_src = pq.read_metadata(f"/root/testdata/sf0.001/{t}.parquet").num_rows
        n_dst = pq.read_metadata(f"{upscaled}/{t}.parquet").num_rows
        assert n_dst == 2 * n_src, t
    for t in ("region", "nation"):  # fixed dims copied once
        n_src = pq.read_metadata(f"/root/testdata/sf0.001/{t}.parquet").num_rows
        assert pq.read_metadata(f"{upscaled}/{t}.parquet").num_rows == n_src


def test_fk_consistency(upscaled):
    cust = set(_col(upscaled, "customer", "c_custkey").to_pylist())
    ocust = set(_col(upscaled, "orders", "o_custkey").to_pylist())
    assert ocust <= cust
    okeys = set(_col(upscaled, "orders", "o_orderkey").to_pylist())
    lkeys = set(_col(upscaled, "lineitem", "l_orderkey").to_pylist())
    assert lkeys <= okeys
    # replica key ranges must not collide
    assert len(cust) == pq.read_metadata(f"{upscaled}/customer.parquet").num_rows


def test_document_vocab_disjoint_across_replicas(upscaled):
    t = pq.read_table(f"{upscaled}/documents.parquet", columns=["doc_id", "text"])
    n = t.num_rows // 2
    texts = t.column("text").to_pylist()
    v0 = set(texts[0].split())
    v1 = set(texts[n].split())  # replica 1 twin of doc 0
    assert v0 and v1 and not (v0 & v1)
    # the token map is a bijection: twin docs have equal token counts
    assert len(texts[0].split()) == len(texts[n].split())


def test_embeddings_rolled_not_duplicated(upscaled):
    t = pq.read_table(f"{upscaled}/embeddings.parquet", columns=["embedding"])
    m = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    n = len(m) // 2
    a, b = m[:n], m[n:]
    # norms preserved (permutation is orthogonal)...
    assert np.allclose(
        np.linalg.norm(a, axis=1), np.linalg.norm(b, axis=1), atol=1e-5
    )
    # ...within-replica geometry identical...
    assert np.allclose(a[:50] @ a[:50].T, b[:50] @ b[:50].T, atol=1e-4)
    # ...but the replica is NOT a copy of the original
    assert not np.allclose(a[:50], b[:50], atol=1e-3)


def test_replica_transform_never_identity():
    """ADVICE r7: np.roll alone is the identity whenever the replica
    index is a multiple of the embedding dimension — the sign-flip
    factor must keep every replica (and every replica PAIR) distinct,
    including i = dim and i = k + dim."""
    sys.path.insert(0, TOOLS)
    try:
        import make_sf1
        importlib.reload(make_sf1)
    finally:
        sys.path.remove(TOOLS)
    rng = np.random.default_rng(7)
    mat = rng.normal(size=(40, 64)).astype(np.float32)
    outs = {}
    for i in (0, 1, 2, 64, 65, 128):  # 64 = dim: roll cancels
        out = make_sf1._transform_embeddings(mat, i)
        # orthogonal: within-replica Gram matrix exactly preserved
        assert np.allclose(mat @ mat.T, out @ out.T, atol=1e-3)
        for j, prev in outs.items():
            assert not np.allclose(prev, out, atol=1e-3), (
                f"replicas {j} and {i} are exact copies"
            )
        outs[i] = out
    # sign patterns themselves are pairwise distinct and never all-+1
    pats = [tuple(make_sf1._replica_signs(i, 64)) for i in range(1, 200)]
    assert len(set(pats)) == len(pats)
    assert all(any(s < 0 for s in p) for p in pats)


def test_replica_signs_low_dim_bound():
    """Review finding: with dim < 32 the sign pattern reads only the
    low dim hash bits, so indices agreeing mod 2^dim collide (dim=8,
    i=256 would be a bit-exact copy of replica 0). The generator now
    refuses instead of silently colliding; distinctness holds inside
    the bound."""
    sys.path.insert(0, TOOLS)
    try:
        import make_sf1
        importlib.reload(make_sf1)
    finally:
        sys.path.remove(TOOLS)
    pats = {tuple(make_sf1._replica_signs(i, 8)) for i in range(256)}
    assert len(pats) == 256  # bijective inside the bound
    with pytest.raises(ValueError):
        make_sf1._replica_signs(256, 8)
    rng = np.random.default_rng(3)
    mat = rng.normal(size=(10, 8)).astype(np.float32)
    with pytest.raises(ValueError):
        make_sf1._transform_embeddings(mat, 256)
