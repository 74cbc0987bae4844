"""Capped end-to-end smoke tests for every example script.

Each example module is imported (its ``__main__`` block does not run)
and its model + sampler configuration is driven through a short capped
``FlowSampler`` run, so a regression in any example-visible surface
fails here. GW examples have their own deeper tests
(``test_gw_example.py``).
"""

import importlib.util
import os

import numpy as np
import pytest

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")

CAPPED = dict(
    nlive=100,
    plot=False,
    checkpointing=False,
    max_iteration=120,
    maximum_uninformed=40,
    poolsize=100,
    flow_config=dict(n_blocks=2, n_neurons=4, n_layers=1),
    training_config=dict(max_epochs=3, patience=2, batch_size=50),
)


def _load(relpath, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)  # examples write ./outdir at import
    path = os.path.join(EXAMPLES, relpath)
    spec = importlib.util.spec_from_file_location(
        relpath.replace("/", "_").replace(".py", ""), path
    )
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


def _run(model, tmp_path, **overrides):
    from nessai_tpu.flowsampler import FlowSampler

    kwargs = dict(CAPPED)
    kwargs.update(overrides)
    fs = FlowSampler(
        model,
        output=str(tmp_path / "run"),
        resume=False,
        seed=42,
        **kwargs,
    )
    fs.run(plot=False, save=False)
    assert np.isfinite(fs.logZ)
    return fs


@pytest.mark.integration_test
def test_2d_gaussian_example(tmp_path, monkeypatch):
    m = _load("2d_gaussian.py", tmp_path, monkeypatch)
    _run(m.GaussianModel(), tmp_path)


@pytest.mark.integration_test
def test_rosenbrock_example(tmp_path, monkeypatch):
    m = _load("rosenbrock.py", tmp_path, monkeypatch)
    _run(m.RosenbrockModel(2), tmp_path)


@pytest.mark.integration_test
def test_eggbox_example(tmp_path, monkeypatch):
    m = _load("eggbox.py", tmp_path, monkeypatch)
    _run(m.EggboxModel(2), tmp_path)


@pytest.mark.integration_test
def test_half_gaussian_example(tmp_path, monkeypatch):
    m = _load("half_gaussian.py", tmp_path, monkeypatch)
    model = m.HalfGaussianModel()
    _run(
        model,
        tmp_path,
        reparameterisations={
            "x": {"reparameterisation": "inversion", "detect_edges": True}
        },
    )


@pytest.mark.integration_test
def test_unbounded_prior_example(tmp_path, monkeypatch):
    m = _load("unbounded_prior.py", tmp_path, monkeypatch)
    _run(
        m.GaussianPriorModel(),
        tmp_path,
        reparameterisations={"x": "default", "y": "zscore"},
    )


@pytest.mark.integration_test
def test_discrete_parameter_example(tmp_path, monkeypatch):
    m = _load("discrete_parameter.py", tmp_path, monkeypatch)
    model_cls = next(
        v
        for k, v in vars(m).items()
        if isinstance(v, type) and k.endswith("Model") and k != "Model"
    )
    fs = _run(
        model_cls(),
        tmp_path,
        reparameterisations={"w": "dequantise", "amp": "default"},
    )
    assert fs.ns.iteration > 0


@pytest.mark.integration_test
def test_reparameterisations_example(tmp_path, monkeypatch):
    m = _load("reparameterisations_example.py", tmp_path, monkeypatch)
    model_cls = next(
        v
        for k, v in vars(m).items()
        if isinstance(v, type) and k.endswith("Model") and k != "Model"
    )
    _run(
        model_cls(),
        tmp_path,
        reparameterisations={"theta": {"reparameterisation": "angle-pi"}},
    )


@pytest.mark.integration_test
def test_corner_plot_example_functions(tmp_path, monkeypatch, rng):
    import matplotlib

    matplotlib.use("Agg")
    _load("corner_plot_example.py", tmp_path, monkeypatch)
    # the example only uses corner_plot on posterior samples
    from nessai_tpu.livepoint import numpy_array_to_live_points
    from nessai_tpu.plot import corner_plot

    x = numpy_array_to_live_points(rng.normal(size=(50, 2)), ["x", "y"])
    assert corner_plot(x) is not None


@pytest.mark.integration_test
def test_bilby_example_fallback(tmp_path, monkeypatch):
    m = _load("bilby_example.py", tmp_path, monkeypatch)
    import nessai_tpu.flowsampler as fsmod

    orig = fsmod.FlowSampler.__init__

    def patched(self, *a, **kw):
        kw.update(CAPPED)
        orig(self, *a, **kw)

    monkeypatch.setattr(fsmod.FlowSampler, "__init__", patched)
    m.outdir = str(tmp_path)
    fs = m.run_without_bilby()
    assert np.isfinite(fs.logZ)


@pytest.mark.integration_test
def test_bilby_unbounded_priors_fallback(tmp_path, monkeypatch):
    m = _load("bilby_unbounded_priors.py", tmp_path, monkeypatch)
    import nessai_tpu.flowsampler as fsmod

    orig = fsmod.FlowSampler.__init__

    def patched(self, *a, **kw):
        kw.update(CAPPED)
        orig(self, *a, **kw)

    monkeypatch.setattr(fsmod.FlowSampler, "__init__", patched)
    m.outdir = str(tmp_path)
    fs = m.run_without_bilby()
    assert np.isfinite(fs.logZ)


@pytest.mark.integration_test
def test_full_gw_example_capped(tmp_path, monkeypatch):
    m = _load("gw/full_gw_example.py", tmp_path, monkeypatch)
    _run(
        m.FullGWModel(),
        tmp_path,
        reparameterisations={
            "phase": {"reparameterisation": "angle-2pi"},
            "psi": {"reparameterisation": "angle-pi"},
            "sky": {
                "reparameterisation": "angle-pair",
                "parameters": ["ra", "dec"],
            },
        },
    )


@pytest.mark.integration_test
def test_calibration_example_capped(tmp_path, monkeypatch):
    m = _load("gw/calibration_example.py", tmp_path, monkeypatch)
    _run(m.CalibratedGWModel(), tmp_path)


@pytest.mark.integration_test
def test_hypercube_prior_example_capped(tmp_path, monkeypatch):
    m = _load(
        "importance_nested_sampler/hypercube_prior.py", tmp_path, monkeypatch
    )
    from nessai_tpu.flowsampler import FlowSampler

    fs = FlowSampler(
        m.ModelWithNonUniformPrior(2),
        output=str(tmp_path / "run"),
        resume=False,
        seed=42,
        nlive=100,
        min_samples=10,
        plot=False,
        checkpointing=False,
        importance_nested_sampler=True,
        min_iteration=1,
        max_iteration=3,
        flow_config=dict(n_blocks=2, n_neurons=4),
        training_config=dict(max_epochs=3, patience=2, batch_size=50),
    )
    fs.run(plot=False, save=False)
    assert np.isfinite(fs.logZ)


@pytest.mark.integration_test
def test_nsf_unit_hypercube_example_capped(tmp_path, monkeypatch):
    m = _load(
        "importance_nested_sampler/nsf_unit_hypercube.py",
        tmp_path,
        monkeypatch,
    )
    from nessai_tpu.flowsampler import FlowSampler

    fc = dict(m.flow_config)
    fc.update(n_blocks=2, n_neurons=4)
    fs = FlowSampler(
        m.RosenbrockModel(4),
        output=str(tmp_path / "run"),
        resume=False,
        seed=42,
        nlive=500,
        plot=False,
        checkpointing=False,
        importance_nested_sampler=True,
        draw_constant=True,
        reparameterisation=None,
        threshold_kwargs={"q": 0.66},
        reset_flow=2,
        min_iteration=1,
        max_iteration=3,
        flow_config=fc,
        training_config=dict(max_epochs=3, patience=2, batch_size=100),
    )
    fs.run(plot=False, save=False)
    assert fs.ns.proposal.reparameterisation is None
    assert np.isfinite(fs.logZ)


@pytest.mark.integration_test
def test_basic_ins_example_capped(tmp_path, monkeypatch):
    m = _load(
        "importance_nested_sampler/basic_ins_example.py",
        tmp_path,
        monkeypatch,
    )
    from nessai_tpu.flowsampler import FlowSampler

    fs = FlowSampler(
        m.RosenbrockModel(2),
        output=str(tmp_path / "run"),
        resume=False,
        seed=1234,
        nlive=100,
        min_samples=10,
        plot=False,
        checkpointing=False,
        importance_nested_sampler=True,
        draw_constant=True,
        min_iteration=1,
        max_iteration=3,
        flow_config=dict(n_blocks=2, n_neurons=4),
        training_config=dict(max_epochs=3, patience=2, batch_size=50),
    )
    fs.run(plot=False, save=False)
    assert np.isfinite(fs.logZ)
