"""Deep branch tests for the augmented flow proposal.

Mirrors the reference's ``tests/test_proposal/test_augmented.py``
(344 LoC): flow-config mask, augment generation modes, augmented
prior / log-prior composition, MC marginalisation, and a real
end-to-end populate.
"""

import numpy as np
import pytest
from scipy.special import logsumexp
from scipy.stats import norm

from nessai_tpu.proposal.augmented import AugmentedFlowProposal


@pytest.fixture()
def proposal(tmp_path, model, rng):
    p = AugmentedFlowProposal(
        model,
        output=str(tmp_path),
        poolsize=100,
        augment_dims=2,
        rng=rng,
        flow_config=dict(n_blocks=2, n_neurons=4),
        training_config=dict(max_epochs=5, patience=3, batch_size=50),
    )
    return p


def test_invalid_generate_augment(model, tmp_path, rng):
    with pytest.raises(RuntimeError, match="Unknown generate_augment"):
        AugmentedFlowProposal(
            model,
            output=str(tmp_path),
            generate_augment="uniform",
            rng=rng,
        )


def test_update_flow_config_mask(proposal):
    proposal.initialise()
    out = proposal.update_flow_config(dict(proposal.flow_config or {}))
    mask = np.asarray(out["mask"])
    # real dims identity (+1), augment dims transformed (-1)
    assert mask.size == proposal.prime_dims
    assert (mask[-2:] == -1).all()
    assert (mask[:-2] == 1).all()


def test_explicit_mask_not_overridden(model, tmp_path, rng):
    p = AugmentedFlowProposal(
        model,
        output=str(tmp_path),
        augment_dims=1,
        rng=rng,
        flow_config=dict(n_blocks=2, n_neurons=4, mask=[1, -1, -1]),
    )
    out = p.update_flow_config(p.flow_config if hasattr(p, "flow_config") else dict(mask=[1, -1, -1]))
    assert list(out["mask"]) == [1, -1, -1]


def test_parameters_extended(proposal):
    proposal.initialise()
    assert proposal.augment_names == ["e_0", "e_1"]
    assert proposal.parameters[-2:] == ["e_0", "e_1"]
    assert proposal.prime_parameters[-2:] == ["e_0", "e_1"]


def test_rescale_gaussian_augment(proposal, model):
    proposal.initialise()
    x = model.new_point(N=64)
    x_prime, log_j = proposal.rescale(x)
    e = np.stack([x_prime["e_0"], x_prime["e_1"]], axis=-1)
    # Gaussian draws: non-zero with ~unit scale
    assert np.std(e) > 0.5
    assert np.isfinite(log_j).all()


def test_rescale_compute_radius_zeros(proposal, model):
    """compute_radius=True must use deterministic zero augments (the
    radius must not depend on random augment draws)."""
    proposal.initialise()
    x = model.new_point(N=8)
    x_prime, _ = proposal.rescale(x, compute_radius=True)
    assert np.all(x_prime["e_0"] == 0.0)
    assert np.all(x_prime["e_1"] == 0.0)


def test_rescale_zeros_mode(model, tmp_path, rng):
    p = AugmentedFlowProposal(
        model,
        output=str(tmp_path),
        augment_dims=1,
        generate_augment="zeros",
        rng=rng,
        flow_config=dict(n_blocks=2, n_neurons=4),
    )
    p.initialise()
    x = model.new_point(N=8)
    x_prime, _ = p.rescale(x)
    assert np.all(x_prime["e_0"] == 0.0)


def test_augmented_prior_and_log_prior(proposal, model):
    proposal.initialise()
    x = model.new_point(N=16)
    x_prime, _ = proposal.rescale(x)
    x_inv, _ = proposal.inverse_rescale(x_prime)
    expected = norm.logpdf(x_inv["e_0"]) + norm.logpdf(x_inv["e_1"])
    np.testing.assert_allclose(proposal.augmented_prior(x_inv), expected)
    # log_prior = model prior + augmented prior when not marginalising
    base = model.batch_evaluate_log_prior(x_inv)
    np.testing.assert_allclose(
        proposal.log_prior(x_inv), base + expected, rtol=1e-10
    )


def test_log_prior_marginalised(model, tmp_path, rng):
    p = AugmentedFlowProposal(
        model,
        output=str(tmp_path),
        augment_dims=1,
        marginalise_augment=True,
        rng=rng,
        flow_config=dict(n_blocks=2, n_neurons=4),
    )
    p.initialise()
    x = model.new_point(N=8)
    x_prime, _ = p.rescale(x)
    x_inv, _ = p.inverse_rescale(x_prime)
    # marginalised mode: augmented prior NOT added
    np.testing.assert_allclose(
        p.log_prior(x_inv), model.batch_evaluate_log_prior(x_inv)
    )


def test_marginalise_augment_consistency(proposal, model):
    """The MC marginalisation formula: logsumexp over n_marg noise draws
    minus log(n_marg), importance-weighted by the noise density."""
    proposal.initialise()
    proposal.n_marg = 4
    x = model.new_point(N=3)
    x_prime, _ = proposal.rescale(x)
    arr = np.stack(
        [np.asarray(x_prime[p], float) for p in proposal.prime_parameters],
        axis=-1,
    )
    out = proposal._marginalise_augment(arr)
    assert out.shape == (3,)
    assert np.isfinite(out).all()


@pytest.mark.integration_test
def test_populate_end_to_end(proposal, model):
    """Train on prior samples and populate a pool: the samples must be
    in bounds with finite weights."""
    proposal.initialise()
    data = model.new_point(N=100)
    data["logL"] = model.batch_evaluate_log_likelihood(data)
    proposal.train(data)
    worst = data[np.argsort(data["logL"])][0]
    proposal.populate(worst, n_samples=50)
    assert proposal.populated
    assert len(proposal.samples) >= 50
    assert model.in_bounds(proposal.samples).all()


@pytest.mark.integration_test
def test_populate_marginalised(model, tmp_path, rng):
    p = AugmentedFlowProposal(
        model,
        output=str(tmp_path),
        poolsize=50,
        augment_dims=1,
        marginalise_augment=True,
        n_marg=8,
        rng=rng,
        flow_config=dict(n_blocks=2, n_neurons=4),
        training_config=dict(max_epochs=5, patience=3, batch_size=50),
    )
    p.initialise()
    data = model.new_point(N=100)
    data["logL"] = model.batch_evaluate_log_likelihood(data)
    p.train(data)
    worst = data[np.argsort(data["logL"])][0]
    p.populate(worst, n_samples=20)
    assert p.populated
    assert model.in_bounds(p.samples).all()
