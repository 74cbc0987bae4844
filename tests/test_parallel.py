"""Tests for the mesh/sharding utilities (8 virtual CPU devices)."""

import jax
import numpy as np
import pytest


@pytest.fixture()
def cpu_mesh():
    from nessai_tpu.parallel import get_mesh

    cpus = jax.devices("cpu")
    if len(cpus) < 8:
        pytest.skip("needs 8 virtual cpu devices")
    return get_mesh(devices=cpus, n_devices=8)


def test_sharded_batch_evaluate(cpu_mesh):
    import jax.numpy as jnp

    from nessai_tpu.parallel import sharded_batch_evaluate

    x = np.random.default_rng(0).normal(size=(101, 4)).astype(np.float32)
    out = sharded_batch_evaluate(
        lambda a: -0.5 * jnp.sum(a**2, axis=-1), x, cpu_mesh
    )
    assert out.shape == (101,)
    np.testing.assert_allclose(out, -0.5 * np.sum(x**2, axis=1), rtol=1e-5)


@pytest.mark.parametrize("n", [1, 3, 8, 11])
def test_pad_to_multiple_small_batches(n):
    from nessai_tpu.parallel import pad_to_multiple

    x = np.arange(n * 2, dtype=np.float32).reshape(n, 2)
    padded, n_valid = pad_to_multiple(x, 8)
    assert n_valid == n
    assert len(padded) % 8 == 0
    assert len(padded) >= n
    np.testing.assert_array_equal(padded[:n], x)
    # filler rows are tiled copies of real rows
    for row in padded[n:]:
        assert any(np.array_equal(row, r) for r in x)


def test_pad_to_multiple_empty_raises():
    from nessai_tpu.parallel import pad_to_multiple

    with pytest.raises(ValueError):
        pad_to_multiple(np.zeros((0, 2), np.float32), 8)


@pytest.mark.parametrize("n", [1, 3])
def test_sharded_batch_evaluate_tiny(cpu_mesh, n):
    import jax.numpy as jnp

    from nessai_tpu.parallel import sharded_batch_evaluate

    x = np.random.default_rng(1).normal(size=(n, 4)).astype(np.float32)
    out = sharded_batch_evaluate(
        lambda a: -0.5 * jnp.sum(a**2, axis=-1), x, cpu_mesh
    )
    assert out.shape == (n,)
    np.testing.assert_allclose(out, -0.5 * np.sum(x**2, axis=1), rtol=1e-5)


def test_dp_train_step(cpu_mesh):
    import optax

    from nessai_tpu.flowmodel.base import _partition_params
    from nessai_tpu.flows import configure_model
    from nessai_tpu.parallel import (
        make_dp_train_step,
        replicated_sharding,
        shard_batch,
    )

    flow, params, _ = configure_model(
        dict(n_inputs=2, n_blocks=2, n_neurons=4, n_layers=1)
    )
    opt = optax.adam(1e-3)
    opt_state = opt.init(_partition_params(params)[0])
    rng = np.random.default_rng(0)
    x = shard_batch(rng.normal(size=(64, 2)).astype(np.float32), cpu_mesh)
    w = shard_batch(np.ones(64, np.float32), cpu_mesh)
    rep = replicated_sharding(cpu_mesh)
    params = jax.device_put(params, rep)
    opt_state = jax.device_put(opt_state, rep)
    step = make_dp_train_step(flow, opt, cpu_mesh)
    params2, opt_state2, loss = step(params, opt_state, x, w)
    assert np.isfinite(float(loss))
    # params actually changed
    changed = jax.tree.map(
        lambda a, b: not np.allclose(np.asarray(a), np.asarray(b)),
        params,
        params2,
    )
    assert any(jax.tree.leaves(changed))


def test_dp_matches_single_device(cpu_mesh):
    """The sharded loss must equal the unsharded loss."""
    import jax.numpy as jnp
    import optax

    from nessai_tpu.flowmodel.base import _partition_params
    from nessai_tpu.flows import configure_model
    from nessai_tpu.parallel import (
        make_dp_train_step,
        replicated_sharding,
        shard_batch,
    )

    flow, params, _ = configure_model(
        dict(n_inputs=2, n_blocks=2, n_neurons=4, n_layers=1)
    )
    rng = np.random.default_rng(1)
    x_np = rng.normal(size=(64, 2)).astype(np.float32)
    w_np = np.ones(64, np.float32)
    expected = float(
        -np.mean(np.asarray(flow.log_prob(params, jnp.asarray(x_np))))
    )
    opt = optax.sgd(0.0)
    opt_state = opt.init(_partition_params(params)[0])
    step = make_dp_train_step(flow, opt, cpu_mesh)
    rep = replicated_sharding(cpu_mesh)
    _, _, loss = step(
        jax.device_put(params, rep),
        jax.device_put(opt_state, rep),
        shard_batch(x_np, cpu_mesh),
        shard_batch(w_np, cpu_mesh),
    )
    assert np.isclose(float(loss), expected, rtol=1e-5)


def test_flowmodel_with_mesh(cpu_mesh, rng, tmp_path):
    """Full FlowModel train + inference with batches sharded over the
    mesh — the real multi-chip path, on 8 virtual devices."""
    from nessai_tpu.flowmodel import FlowModel

    fm = FlowModel(
        flow_config=dict(n_inputs=2, n_blocks=2, n_neurons=8, n_layers=1),
        training_config=dict(max_epochs=5, batch_size=64, patience=3),
        output=str(tmp_path),
        rng=rng,
        mesh=cpu_mesh,
    )
    x = rng.normal(size=(512, 2)).astype(np.float32)
    history = fm.train(x)
    assert np.isfinite(history["loss"]).all()
    assert history["loss"][-1] < history["loss"][0]
    # sharded inference returns correct shapes/values
    z, lp = fm.forward_and_log_prob(x[:100])
    assert z.shape == (100, 2)
    assert np.isfinite(lp).all()
    # matches an unsharded model loaded from the same weights
    import pickle

    fm.save_weights(str(tmp_path / "w.pkl"))
    fm2 = FlowModel(
        flow_config=dict(n_inputs=2, n_blocks=2, n_neurons=8, n_layers=1),
        rng=np.random.default_rng(0),
    )
    fm2.load_weights(str(tmp_path / "w.pkl"))
    np.testing.assert_allclose(lp, fm2.forward_and_log_prob(x[:100])[1], atol=1e-5)


def test_full_sampler_with_mesh(cpu_mesh, tmp_path):
    """End-to-end nested sampling with flow training + inference sharded
    over the 8-device mesh."""
    from nessai_tpu.flowsampler import FlowSampler
    from nessai_tpu.utils.testing import IntegrationTestModel

    fs = FlowSampler(
        IntegrationTestModel(2),
        output=str(tmp_path),
        nlive=100,
        seed=12,
        resume=False,
        plot=False,
        max_iteration=120,
        maximum_uninformed=40,
        flow_config=dict(n_blocks=2, n_neurons=4, n_layers=1),
        training_config=dict(max_epochs=5, batch_size=64, patience=3),
        poolsize=100,
        mesh=cpu_mesh,
        precompile=False,
    )
    fs.run(plot=False, save=False)
    assert fs.ns._flow_proposal.training_count >= 1
    assert np.isfinite(fs.logZ)


def test_ins_flowmodel_with_mesh(cpu_mesh, rng, tmp_path):
    """ImportanceFlowModel trains and evaluates log_prob_all with batches
    sharded over the mesh."""
    from nessai_tpu.flowmodel.importance import ImportanceFlowModel

    fm = ImportanceFlowModel(
        flow_config=dict(n_inputs=2, n_blocks=2, n_neurons=8, n_layers=1),
        training_config=dict(max_epochs=3, batch_size=64, patience=2),
        output=str(tmp_path),
        rng=rng,
        mesh=cpu_mesh,
    )
    x = rng.normal(size=(256, 2)).astype(np.float32)
    fm.add_new_flow(reset=True)
    fm.train(x)
    fm.add_new_flow(reset=True)
    fm.train(x)
    lp = fm.log_prob_all(x[:50])
    assert lp.shape == (50, 2)
    assert np.isfinite(lp).all()


def test_fused_populate_sharded_matches_single_device(
    cpu_mesh, rng, tmp_path, model, flow_config, training_config
):
    """The fused populate program (latent inverse -> de-rescale -> bounds
    -> likelihood) produces the same outputs batch-sharded over the mesh
    as on a single device."""
    import jax

    from nessai_tpu.parallel import replicated_sharding
    from nessai_tpu.proposal import FlowProposal

    fp = FlowProposal(
        model,
        output=str(tmp_path),
        poolsize=64,
        flow_config=flow_config,
        training_config=training_config,
        rng=rng,
        plot=False,
    )
    fp.initialise()
    assert fp._can_fuse_populate
    x = model.new_point(128)
    x["logL"] = model.batch_evaluate_log_likelihood(x)
    fp.train(x, plot=False)

    z = fp.flow.sample_latent_distribution(37)
    single = fp._fused_backward(z)

    # switch the FlowModel onto the mesh (params replicated) and rerun
    fp.flow.mesh = cpu_mesh
    fp.flow._scope = None  # mesh is part of the program scope key
    fp.flow.params = jax.device_put(
        fp.flow.params, replicated_sharding(cpu_mesh)
    )
    sharded = fp._fused_backward(z)

    for a, b in zip(single, sharded):
        np.testing.assert_allclose(
            np.asarray(a, np.float64),
            np.asarray(b, np.float64),
            rtol=1e-5,
            atol=1e-5,
        )


def test_full_ins_sampler_with_mesh(cpu_mesh, tmp_path):
    """End-to-end importance nested sampling with each level's training
    and density evaluation sharded over the 8-device mesh (the mesh
    kwarg reaches ImportanceFlowProposal via the kwargs cascade)."""
    from nessai_tpu.flowsampler import FlowSampler
    from nessai_tpu.utils.testing import IntegrationTestModel

    fs = FlowSampler(
        IntegrationTestModel(2),
        output=str(tmp_path),
        nlive=100,
        min_samples=10,
        seed=13,
        resume=False,
        plot=False,
        checkpointing=False,
        importance_nested_sampler=True,
        min_iteration=2,
        max_iteration=3,
        flow_config=dict(n_blocks=2, n_neurons=4, n_layers=1),
        training_config=dict(max_epochs=5, batch_size=64, patience=3),
        mesh=cpu_mesh,
    )
    fs.run(plot=False, save=False)
    assert fs.ns.proposal.mesh is cpu_mesh
    assert fs.ns.proposal.flow.mesh is cpu_mesh
    assert fs.ns.proposal.level_count >= 0
    assert np.isfinite(fs.logZ)


def test_callback_likelihood_mesh_populate_matches_jax(
    cpu_mesh, tmp_path, flow_config, training_config
):
    """Sharded host-dispatch populate (callback likelihood on a mesh)
    draws the SAME pool as the jax-likelihood path: the sharded program
    (flow inverse + reparams + bounds) excludes the likelihood, which is
    dispatched on the host for surviving draws only — the draw and
    rejection streams are identical, so accepted samples match and logL
    agrees to float32 evaluation noise. Pool contract:
    reference ``utils/multiprocessing.py:134-196``."""
    import jax

    from nessai_tpu.parallel import replicated_sharding
    from nessai_tpu.proposal import FlowProposal
    from nessai_tpu.utils.testing import IntegrationTestModel

    class CallbackModel(IntegrationTestModel):
        jax_log_likelihood = None
        likelihood_callback = True

    def build(model_cls, out):
        model = model_cls(2)
        model.set_rng(np.random.default_rng(909))
        fp = FlowProposal(
            model,
            output=str(out),
            poolsize=64,
            flow_config=flow_config,
            training_config=training_config,
            rng=np.random.default_rng(909),
            plot=False,
            mesh=cpu_mesh,
        )
        fp.initialise()
        x = model.new_point(128)
        x["logL"] = model.batch_evaluate_log_likelihood(x)
        fp.train(x, plot=False)
        fp.flow.params = jax.device_put(
            fp.flow.params, replicated_sharding(cpu_mesh)
        )
        fp.populate(x[:1], n_samples=32)
        return fp

    fp_jax = build(IntegrationTestModel, tmp_path / "jax")
    fp_cb = build(CallbackModel, tmp_path / "cb")

    assert fp_cb._can_fuse_populate
    assert fp_cb._resolve_fuse_likelihood() is False  # split path
    assert fp_jax.populated and fp_cb.populated
    a, b = fp_jax.samples, fp_cb.samples
    assert len(a) == len(b) == 32
    for name in fp_jax.model.names:
        np.testing.assert_allclose(a[name], b[name], rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(a["logL"], b["logL"], rtol=1e-4, atol=1e-4)
