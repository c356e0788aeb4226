"""Sharding/mesh tests on the 8-device virtual CPU mesh + driver entries."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_mesh_and_sharded_cnn_apply():
    from dnascent_tpu.models import cnn as cnn_mod
    from dnascent_tpu.parallel import mesh as pmesh

    mesh = pmesh.make_mesh(n_data=4, n_seq=2)
    model = cnn_mod.create_model(d_model=32, d_core=8, d_residual=8,
                                 d_signal=8, dilations=(1, 2))
    params = cnn_mod.default_params(model)
    apply = pmesh.sequence_sharded_apply(model, mesh)
    rng = np.random.default_rng(0)
    B, L = 8, 128
    core = rng.integers(1, 1025, size=(B, L)).astype(np.int32)
    resid = rng.integers(1, 257, size=(B, L)).astype(np.int32)
    sig = rng.normal(0, 1, size=(B, L, cnn_mod.RAWDEPTH)).astype(np.float32)
    out = np.asarray(apply(params, jnp.asarray(core), jnp.asarray(resid),
                           jnp.asarray(sig)))
    assert out.shape == (B, L, 3)
    # sharded result equals unsharded result (halo exchange is exact)
    ref = np.asarray(model.apply(params, core, resid, sig))
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-3)


def test_graft_entry_single():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (4, 512, 3)
    probs = np.asarray(out)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-4)


def test_graft_entry_multichip():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_shard_files_for_host():
    from dnascent_tpu.parallel.mesh import shard_files_for_host
    files = [f"f{i}" for i in range(10)]
    a = shard_files_for_host(files, 0, 3)
    b = shard_files_for_host(files, 1, 3)
    c = shard_files_for_host(files, 2, 3)
    assert sorted(a + b + c) == sorted(files)
    assert not (set(a) & set(b))


def test_detect_pipeline_mesh_sharded_bitwise_equal(models, cfg):
    """The full detect pipeline (prep -> eventalign -> CNN) under an active
    8-device compute mesh produces bitwise-identical per-read outputs to the
    single-device run (every kernel is batch-parallel; GSPMD sharding must
    not change per-row math)."""
    from dnascent_tpu.models import cnn as cnn_mod
    from dnascent_tpu.parallel import compute
    from dnascent_tpu.pipeline.detect import detect_reads
    from dnascent_tpu.pipeline.source import SimulatedSource

    model = cnn_mod.create_model(d_model=32, d_core=8, d_residual=8,
                                 d_signal=8, dilations=(1, 2))
    params = cnn_mod.default_params(model)

    def run(mesh):
        compute.set_compute_mesh(mesh)
        try:
            src = SimulatedSource(models, cfg, n_reads=6, length=1500,
                                  seed=7)
            out = {}
            for rid, d in detect_reads(list(src), models, model, params,
                                       cfg, batch_size=3, pipeline_depth=1):
                out[rid] = d
            return out
        finally:
            compute.set_compute_mesh(None)

    a = run(None)
    b = run(compute.make_data_mesh())
    assert set(a) == set(b) and len(a) >= 5
    for rid in a:
        assert np.array_equal(a[rid].ref_coords, b[rid].ref_coords)
        assert np.array_equal(a[rid].brdu_prob, b[rid].brdu_prob)
        assert np.array_equal(a[rid].edu_prob, b[rid].edu_prob)
        assert np.array_equal(a[rid].kmer_starts, b[rid].kmer_starts)
