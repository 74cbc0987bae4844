"""Unit tests for FlowSampler behaviours and truncation modes."""

import json
import os
import signal

import numpy as np
import pytest

from nessai_tpu.flowsampler import FlowSampler
from nessai_tpu.utils.testing import IntegrationTestModel


def _fs(tmp_path, flow_config, training_config, **kwargs):
    defaults = dict(
        output=str(tmp_path),
        nlive=100,
        seed=21,
        resume=False,
        plot=False,
        max_iteration=40,
        maximum_uninformed=10000,
        flow_config=flow_config,
        training_config=training_config,
        poolsize=100,
    )
    defaults.update(kwargs)
    return FlowSampler(IntegrationTestModel(2), **defaults)


def test_config_json_saved(tmp_path, flow_config, training_config):
    fs = _fs(tmp_path, flow_config, training_config)
    cfg = json.load(open(tmp_path / "config.json"))
    assert cfg["nlive"] == 100
    assert cfg["importance_nested_sampler"] is False


def test_disable_vectorisation(tmp_path, flow_config, training_config):
    fs = _fs(
        tmp_path, flow_config, training_config, disable_vectorisation=True
    )
    assert fs.ns.model.allow_vectorised is False


def test_likelihood_chunksize_forwarded(tmp_path, flow_config, training_config):
    fs = _fs(
        tmp_path, flow_config, training_config, likelihood_chunksize=50
    )
    assert fs.ns.model.likelihood_chunksize == 50


def test_resume_data(tmp_path, flow_config, training_config):
    fs = _fs(tmp_path, flow_config, training_config)
    fs.run(plot=False, save=False)
    import pickle

    blob = pickle.loads(pickle.dumps(fs.ns))
    fs2 = FlowSampler(
        IntegrationTestModel(2),
        output=str(tmp_path),
        resume_data=blob,
        plot=False,
        flow_config=flow_config,
        training_config=training_config,
    )
    assert fs2.ns.iteration == fs.ns.iteration


def test_safe_exit_checkpoints(tmp_path, flow_config, training_config):
    fs = _fs(tmp_path, flow_config, training_config, checkpointing=True)
    fs.ns.initialise()
    with pytest.raises(SystemExit) as exc:
        fs.safe_exit(signum=signal.SIGTERM)
    assert exc.value.code == 130
    assert os.path.exists(tmp_path / "nested_sampler_resume.pkl")


def test_latent_radius_modes(model, rng, tmp_path, flow_config, training_config):
    from nessai_tpu.proposal import FlowProposal

    for truncation, check in [
        ({"latent_radius": {"mode": "fixed", "radius": 3.0}}, 3.0),
        ({"latent_radius": {"mode": "constant_volume", "q": 0.9}}, None),
        (
            {"latent_radius": {"mode": "adaptive", "expansion_fraction": 1.0}},
            None,
        ),
    ]:
        fp = FlowProposal(
            model,
            output=str(tmp_path),
            poolsize=100,
            flow_config=flow_config,
            training_config=training_config,
            rng=rng,
            plot=False,
            truncation=truncation,
            precompile=False,
        )
        fp.initialise()
        x = model.new_point(150)
        x["logL"] = model.batch_evaluate_log_likelihood(x)
        fp.train(x, plot=False)
        fp.populate(x[0], n_samples=50)
        assert fp.populated
        assert np.isfinite(fp.r)
        if check is not None:
            assert fp.r == check
        # latent draws respect the radius (up to fuzz)
        rule = fp._truncation_scheme.rules[0]
        z = fp.sample_latent_distribution(100)
        assert np.all(
            np.linalg.norm(z, axis=1) <= fp.r * rule.fuzz + 1e-8
        )


def test_accumulate_weights_with_likelihood_truncation(
    model, rng, tmp_path, flow_config, training_config
):
    from nessai_tpu.proposal import FlowProposal

    fp = FlowProposal(
        model,
        output=str(tmp_path),
        poolsize=60,
        flow_config=flow_config,
        training_config=training_config,
        rng=rng,
        plot=False,
        accumulate_weights=True,
        truncation={
            "latent_radius": {"mode": "constant_volume"},
            "likelihood_threshold": {},
        },
        precompile=False,
    )
    fp.initialise()
    x = model.new_point(150)
    x["logL"] = model.batch_evaluate_log_likelihood(x)
    fp.train(x, plot=False)
    worst = np.sort(x, order="logL")[50]
    fp.populate(worst, n_samples=60)
    assert np.all(fp.samples["logL"] > worst["logL"])


def test_angle_pair_az_zen(rng):
    from nessai_tpu.reparameterisations import AnglePair

    r = AnglePair(
        parameters=["az", "zen"],
        prior_bounds={"az": [0, 2 * np.pi], "zen": [0, np.pi]},
        rng=rng,
    )
    assert r.convention == "az-zen"
    from nessai_tpu.livepoint import numpy_array_to_live_points

    n = 20
    vals = np.stack(
        [rng.uniform(0, 2 * np.pi, n), rng.uniform(0.1, np.pi - 0.1, n)],
        axis=1,
    )
    x = numpy_array_to_live_points(vals, ["az", "zen"])
    x_prime = np.zeros(n, dtype=[(p, "f8") for p in r.prime_parameters])
    x1, x_prime, log_j = r.reparameterise(x.copy(), x_prime, np.zeros(n))
    names = ["az", "zen", r.auxiliary_parameters[0]]
    x_out = np.zeros(n, dtype=[(nm, "f8") for nm in names])
    x_out, _, log_j_inv = r.inverse_reparameterise(
        x_out, x_prime, np.zeros(n)
    )
    np.testing.assert_allclose(x_out["az"], x["az"], atol=1e-10)
    np.testing.assert_allclose(x_out["zen"], x["zen"], atol=1e-10)
    np.testing.assert_allclose(log_j + log_j_inv, 0, atol=1e-10)
