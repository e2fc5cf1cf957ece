"""Batched host→device upload (utils/pack.py) — the axon relay charges
~0.4 s per host→device array, so setup ships one buffer per dtype."""

import numpy as np
import pytest

import omp_amg_tpu as amg
from omp_amg_tpu.amg.hierarchy import amg_setup
from omp_amg_tpu.amg.params import AMGParams
from omp_amg_tpu.utils.pack import DeferredUpload


def test_deferred_upload_roundtrip():
    b = DeferredUpload(eager=False)
    parts = [np.arange(7, dtype=np.float32),
             np.arange(12, dtype=np.int32).reshape(3, 4),
             np.float32(3.25).reshape(()),
             np.arange(5, dtype=np.float64) * 0.5,
             np.arange(6, dtype=np.float32).reshape(2, 3)]
    hs = [b.add(p) for p in parts]
    tree = {"x": hs[0], "rest": (hs[1], hs[2]), "more": [hs[3], hs[4]]}
    out = b.resolve(tree)
    np.testing.assert_array_equal(np.asarray(out["x"]), parts[0])
    np.testing.assert_array_equal(np.asarray(out["rest"][0]), parts[1])
    np.testing.assert_array_equal(np.asarray(out["rest"][1]), parts[2])
    np.testing.assert_array_equal(np.asarray(out["more"][0]), parts[3])
    np.testing.assert_array_equal(np.asarray(out["more"][1]), parts[4])
    assert out["rest"][1].shape == ()


def test_deferred_upload_dtype_convert_and_empty():
    b = DeferredUpload(eager=False)
    h = b.add(np.arange(4, dtype=np.float64), np.float32)
    out = b.resolve((h,))[0]
    assert out.dtype == np.float32
    b2 = DeferredUpload(eager=False)
    assert b2.resolve({"a": 1}) == {"a": 1}   # no parts → no-op


@pytest.mark.parametrize("mode", ["structured", "pmis"])
def test_batched_setup_equals_eager(monkeypatch, mode):
    """Hierarchies built through the batched uploader are bit-identical to
    the eager ones (the TPU path is batched; CPU tests force it)."""
    import jax

    from omp_amg_tpu.utils import pack

    N = 16
    a = amg.poisson3d_7pt(N)
    kw = (dict(grid=(N,) * 3) if mode == "structured"
          else dict(params=AMGParams(coarsening="pmis")))
    if mode == "pmis":
        h_eager = amg_setup(a, kw["params"])
    else:
        h_eager = amg_setup(a, **kw)
    real_init = pack.DeferredUpload.__init__
    monkeypatch.setattr(pack.DeferredUpload, "__init__",
                        lambda self, eager=None: real_init(self, eager=False))
    if mode == "pmis":
        h_batch = amg_setup(a, kw["params"])
    else:
        h_batch = amg_setup(a, **kw)
    l_e, _ = jax.tree_util.tree_flatten(h_eager)
    l_b, _ = jax.tree_util.tree_flatten(h_batch)
    assert len(l_e) == len(l_b) and len(l_b) > 0
    for x, y in zip(l_e, l_b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_deferred_upload_sparse_scatter():
    b = DeferredUpload(eager=False)
    dense = np.zeros((64, 128), np.float32)
    dense[3, 5] = 2.5
    dense[60, 100] = -1.0
    h = b.add(dense, sparse=True)
    small = np.arange(8, dtype=np.int32).reshape(2, 4)
    h2 = b.add(small, sparse=True)   # falls back to dense (not sparse enough)
    out = b.resolve((h, h2))
    np.testing.assert_array_equal(np.asarray(out[0]), dense)
    np.testing.assert_array_equal(np.asarray(out[1]), small)


def test_native_sparse_encode_matches_numpy_probes():
    """csrc sparse_encode_w4/w2 must reproduce pack.py's numpy probe
    semantics bit-exactly: f32 compares by VALUE (−0.0 is zero), int32 by
    bit pattern, bfloat16 by its uint16 bit-pattern view (−0.0 counts)."""
    import ml_dtypes
    import pytest

    from omp_amg_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(11)

    x32 = np.where(rng.random(100_003) < 0.8, 0,
                   rng.standard_normal(100_003)).astype(np.float32)
    x32[7] = -0.0    # value-compare: excluded, like np.flatnonzero
    enc = native.sparse_encode(x32)
    ref = np.flatnonzero(x32)
    np.testing.assert_array_equal(enc[0], ref)
    np.testing.assert_array_equal(enc[1], x32[ref])

    xi = np.where(rng.random(70_001) < 0.7, 0,
                  rng.integers(-9, 9, 70_001)).astype(np.int32)
    xi[3] = np.int32(-2**31)   # bit pattern of f32 −0.0: must be KEPT
    enc = native.sparse_encode(xi)
    ref = np.flatnonzero(xi)
    np.testing.assert_array_equal(enc[0], ref)
    np.testing.assert_array_equal(enc[1], xi[ref])

    xb = np.where(rng.random(50_001) < 0.75, 0,
                  rng.standard_normal(50_001)).astype(ml_dtypes.bfloat16)
    xb[5] = ml_dtypes.bfloat16(-0.0)   # bit-pattern probe: INCLUDED
    enc = native.sparse_encode(xb)
    ref = np.flatnonzero(xb.view(np.uint16))
    np.testing.assert_array_equal(enc[0], ref)
    np.testing.assert_array_equal(enc[1].view(np.uint16),
                                  xb[ref].view(np.uint16))


def test_delta_encode_parts_matches_numpy():
    """Native per-part delta encoding == the numpy fused-stream encoder,
    including gap-255 boundary, multi-part offsets and exceptions."""
    from omp_amg_tpu import native
    from omp_amg_tpu.utils.pack import _delta_encode

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(5)
    # gaps around the escape threshold + some huge ones
    gaps = rng.choice([1, 2, 253, 254, 255, 256, 100000], size=20000,
                      p=[.5, .2, .08, .08, .08, .05, .01])
    idx = np.cumsum(gaps).astype(np.int64) - 1
    cut = 12000
    i1 = idx[:cut].astype(np.int32)
    off2 = int(idx[cut - 1]) + 7
    i2 = (idx[cut:] - idx[cut]).astype(np.int32)  # re-based second part
    fused = np.concatenate([i1, i2 + off2])
    d_ref, p_ref, g_ref = _delta_encode(fused)
    d, p, g = native.delta_encode_parts([(i1, 0), (i2, off2)])
    np.testing.assert_array_equal(d, d_ref)
    np.testing.assert_array_equal(p, p_ref)
    np.testing.assert_array_equal(g, g_ref)
    # empty part and empty stream
    d, p, g = native.delta_encode_parts([(np.zeros(0, np.int32), 0),
                                         (i1, 0)])
    np.testing.assert_array_equal(d, d_ref[:cut])
    assert native.delta_encode_parts([])[0].size == 0


def test_add_routed_lanes_roundtrip_with_explicit_zero():
    """add_routed derives the packed lidx words on device; a slot whose
    VALUE is zero drops its lane bits (0·finite reads — the routed
    invariant), everything else is bit-equal to the host packing."""
    import scipy.sparse as sp

    from omp_amg_tpu.sparse.routed import routed_from_scipy, routed_to_scipy

    rng = np.random.default_rng(9)
    m = sp.random(4000, 4000, density=0.003, random_state=rng,
                  format="csr")
    m.data[:] = rng.standard_normal(m.nnz)
    m.data[m.nnz // 2] = 0.0          # explicit stored zero
    m.sort_indices()
    b = DeferredUpload(eager=False)
    rt = b.resolve(routed_from_scipy(m, put=b.add))
    me = m.copy()
    me.eliminate_zeros()
    back = routed_to_scipy(rt)
    assert abs(back - me).max() < 1e-6
