"""Unit tests for NestedSampler internals (cf. reference
tests/test_samplers/test_nested_sampler/)."""

import os

import numpy as np
import pytest

from nessai_tpu.livepoint import empty_structured_array
from nessai_tpu.samplers.nestedsampler import NestedSampler


@pytest.fixture()
def sampler(model, tmp_path, flow_config, training_config):
    return NestedSampler(
        model,
        nlive=50,
        output=str(tmp_path),
        seed=1,
        plot=False,
        checkpointing=False,
        maximum_uninformed=100,
        cooldown=10,
        flow_config=flow_config,
        training_config=training_config,
        poolsize=50,
    )


def _fake_live_points(sampler, n=50):
    lp = empty_structured_array(n, names=sampler.model.names)
    arr = np.linspace(-1, 1, n)
    for name in sampler.model.names:
        lp[name] = arr
    lp["logL"] = np.sort(np.random.default_rng(0).normal(size=n))
    lp["logP"] = 0.0
    sampler.live_points = np.sort(lp, order="logL")
    return sampler.live_points


def test_insert_live_point_indices(sampler):
    lp = _fake_live_points(sampler)
    new = lp[25].copy()
    new["logL"] = (lp["logL"][30] + lp["logL"][31]) / 2
    index = sampler.insert_live_point(new)
    assert index == 30
    # still sorted
    assert np.all(np.diff(sampler.live_points["logL"]) >= 0)


def test_insert_live_point_at_end(sampler):
    lp = _fake_live_points(sampler)
    new = lp[0].copy()
    new["logL"] = lp["logL"][-1] + 1.0
    index = sampler.insert_live_point(new)
    assert index == sampler.nlive - 1
    assert sampler.live_points["logL"][-1] == new["logL"]


def test_check_proposal_switch_by_iteration(sampler):
    sampler.iteration = 101
    assert sampler.check_proposal_switch() is True
    assert sampler.proposal is sampler._flow_proposal
    assert not sampler.uninformed_sampling


def test_check_proposal_switch_by_acceptance(sampler):
    sampler.mean_block_acceptance = 0.01
    assert sampler.check_proposal_switch() is True


def test_no_switch_when_healthy(sampler):
    sampler.iteration = 10
    sampler.mean_block_acceptance = 0.9
    assert sampler.check_proposal_switch() is False
    assert sampler.uninformed_sampling


def test_check_training_on_empty(sampler):
    sampler.proposal = sampler._flow_proposal
    sampler.proposal.populated = False
    train, force = sampler.check_training()
    assert train and force


def test_check_training_cooldown_blocks(sampler):
    sampler.proposal = sampler._flow_proposal
    sampler.proposal.populated = True
    sampler.train_on_empty = False
    sampler.training_frequency = 5
    sampler.iteration = 8
    sampler.last_updated = 4
    # frequency met but cooldown (10) not elapsed
    train, force = sampler.check_training()
    assert not train


def test_check_flow_model_reset(sampler):
    sampler._flow_proposal.initialise()
    sampler._flow_proposal.training_count = 2
    sampler.reset_weights = 2.0
    before = sampler._flow_proposal.flow.params
    sampler.check_flow_model_reset()
    after = sampler._flow_proposal.flow.params
    import jax

    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after))
        if np.issubdtype(np.asarray(a).dtype, np.floating)
    )
    assert changed


def test_populate_live_points(sampler):
    sampler._uninformed_proposal.initialise()
    sampler.populate_live_points()
    assert len(sampler.live_points) == 50
    assert np.all(np.diff(sampler.live_points["logL"]) >= 0)
    assert np.isfinite(sampler.live_points["logL"]).all()


def test_prior_sampling(model, tmp_path, flow_config, training_config):
    ns = NestedSampler(
        model,
        nlive=30,
        output=str(tmp_path),
        seed=2,
        plot=False,
        checkpointing=False,
        prior_sampling=True,
        flow_config=flow_config,
        training_config=training_config,
    )
    logZ, samples = ns.nested_sampling_loop()
    assert len(samples) == 30


def test_resume_fallback_to_old(model, tmp_path, flow_config, training_config):
    """Corrupt resume file falls back to .old."""
    from nessai_tpu.flowsampler import FlowSampler

    fs = FlowSampler(
        model,
        output=str(tmp_path),
        nlive=50,
        seed=3,
        resume=False,
        plot=False,
        max_iteration=20,
        maximum_uninformed=10000,
        flow_config=flow_config,
        training_config=training_config,
    )
    fs.run(plot=False, save=False)
    fs.ns.checkpoint(force=True)
    fs.ns.checkpoint(force=True)  # rotates the first file to .old
    resume_file = os.path.join(str(tmp_path), "nested_sampler_resume.pkl")
    with open(resume_file, "wb") as f:
        f.write(b"corrupt")
    from nessai_tpu.utils.testing import IntegrationTestModel

    fs2 = FlowSampler(
        IntegrationTestModel(2),
        output=str(tmp_path),
        resume=True,
        plot=False,
        flow_config=flow_config,
        training_config=training_config,
    )
    assert fs2.ns.iteration == 20


class TestRound3Branches:
    """Config/maintenance branches: update_output, memory-augmented
    training, flow resets (reference nestedsampler.py:560,861-961)."""

    def _sampler(self, model, tmp_path, **kw):
        from nessai_tpu.samplers.nestedsampler import NestedSampler

        kw.setdefault("nlive", 50)
        kw.setdefault("plot", False)
        kw.setdefault("seed", 1)
        return NestedSampler(model, output=str(tmp_path), **kw)

    def test_update_output_moves_resume_and_proposal(self, model, tmp_path):
        ns = self._sampler(model, tmp_path / "a")
        new = tmp_path / "b"
        ns.update_output(str(new))
        assert ns.output == str(new)
        assert ns.resume_file.startswith(str(new))
        assert ns._flow_proposal.output.startswith(str(new))

    def test_proposal_population_time_sums(self, model, tmp_path):
        import datetime

        ns = self._sampler(model, tmp_path)
        ns._uninformed_proposal.population_time = datetime.timedelta(
            seconds=2
        )
        ns._flow_proposal.population_time = datetime.timedelta(seconds=3)
        assert ns.proposal_population_time.total_seconds() == 5

    def test_check_flow_model_reset_acceptance(self, model, tmp_path):
        from unittest.mock import MagicMock

        ns = self._sampler(model, tmp_path, reset_acceptance=True)
        ns._flow_proposal.training_count = 1
        ns._flow_proposal.flow = MagicMock()
        ns.mean_block_acceptance = 0.0
        ns.check_flow_model_reset()
        ns._flow_proposal.flow.reset_model.assert_called_once_with(
            weights=True, permutations=True
        )

    def test_check_flow_model_reset_schedules(self, model, tmp_path):
        from unittest.mock import MagicMock

        ns = self._sampler(
            model, tmp_path, reset_weights=2, reset_permutations=3
        )
        ns._flow_proposal.training_count = 6  # divisible by both
        ns._flow_proposal.flow = MagicMock()
        ns.check_flow_model_reset()
        ns._flow_proposal.flow.reset_model.assert_called_once_with(
            weights=True, permutations=True
        )

    def test_check_flow_model_reset_untrained_noop(self, model, tmp_path):
        from unittest.mock import MagicMock

        ns = self._sampler(model, tmp_path, reset_weights=1)
        ns._flow_proposal.training_count = 0
        ns._flow_proposal.flow = MagicMock()
        ns.check_flow_model_reset()
        ns._flow_proposal.flow.reset_model.assert_not_called()

    def test_train_proposal_cooldown_skip(self, model, tmp_path):
        from unittest.mock import MagicMock

        ns = self._sampler(model, tmp_path, cooldown=100)
        ns._flow_proposal = MagicMock()
        ns.iteration = 10
        ns.last_updated = 0
        ns.train_proposal(force=False)
        ns._flow_proposal.train.assert_not_called()

    def test_train_proposal_memory_concatenates(self, model, tmp_path):
        from unittest.mock import MagicMock

        ns = self._sampler(model, tmp_path, memory=5, cooldown=0)
        ns.live_points = model.new_point(10)
        pts = model.new_point(8)
        ns.nested_samples = list(pts)
        ns._flow_proposal = MagicMock()
        ns._flow_proposal.training_count = 1
        ns.train_proposal(force=True)
        (args, kwargs) = ns._flow_proposal.train.call_args
        assert len(args[0]) == 15  # 10 live + 5 memory
        assert ns.train_count == 1
        assert ns.completed_training

    def test_check_training_branches(self, model, tmp_path):
        ns = self._sampler(
            model,
            tmp_path,
            cooldown=10,
            training_frequency=20,
            retrain_acceptance=True,
            acceptance_threshold=0.5,
        )

        class P:
            populated = False

        ns.proposal = P()
        # incomplete training resumes training
        ns.completed_training = False
        assert ns.check_training() == (True, True)
        ns.completed_training = True
        # populated pool -> no training
        P.populated = True
        assert ns.check_training() == (False, False)
        P.populated = False
        # train_on_empty forces
        assert ns.check_training() == (True, True)
        ns.train_on_empty = False
        # acceptance-triggered (needs block_iteration >= cooldown)
        ns.mean_block_acceptance = 0.1
        ns.block_iteration = 20
        assert ns.check_training() == (True, True)
        # frequency-triggered (not forced) but within cooldown -> no
        ns.mean_block_acceptance = 1.0
        ns.iteration = 21
        ns.last_updated = 20
        ns.training_frequency = 1
        assert ns.check_training() == (False, False)
        # frequency-triggered outside cooldown
        ns.iteration = 40
        ns.last_updated = 20
        assert ns.check_training() == (True, False)


class _PoolProposal:
    """Minimal pool-bearing proposal for the vectorised-pop fast path."""

    def __init__(self, logLs):
        from nessai_tpu.livepoint import empty_structured_array

        n = len(logLs)
        self.samples = empty_structured_array(n, names=["x"])
        self.samples["x"] = np.arange(n, dtype=float)
        self.samples["logL"] = np.asarray(logLs, dtype=float)
        self.indices = list(range(n))
        self.populated = True

    def draw(self, old):
        index = self.indices.pop()
        new_sample = self.samples[index]
        if not self.indices:
            self.populated = False
        return new_sample


class TestPopPoolVectorised:
    """_pop_pool_vectorised must replicate one yield_sample round."""

    @pytest.mark.parametrize(
        "logLs, logLmin",
        [
            # hit after several sub-threshold pops (pop order is reversed)
            ([5.0, -1.0, -2.0, 3.0, -4.0, -5.0], 0.0),
            # first pop is the hit
            ([0.1, 0.2, 9.0], 0.0),
            # pool exhausted without a hit
            ([-3.0, -2.0, -1.0], 0.0),
            # last popped entry is the hit (pool empties on success)
            ([7.0, -1.0, -2.0], 0.0),
        ],
    )
    def test_matches_yield_sample(self, sampler, logLs, logLmin):
        ref = _PoolProposal(logLs)
        fast = _PoolProposal(logLs)

        sampler.logLmin = logLmin
        sampler.proposal = ref
        gen = sampler.yield_sample(ref.samples[0].copy())
        count_ref, sample_ref = next(gen)

        sampler.proposal = fast
        out = sampler._pop_pool_vectorised()
        assert out is not None
        count_fast, sample_fast = out

        assert count_fast == count_ref
        assert sample_fast["logL"] == sample_ref["logL"]
        assert sample_fast["x"] == sample_ref["x"]
        assert fast.indices == ref.indices
        assert fast.populated == ref.populated

    def test_falls_back_when_unpopulated(self, sampler):
        prop = _PoolProposal([1.0, 2.0])
        prop.populated = False
        sampler.proposal = prop
        assert sampler._pop_pool_vectorised() is None

    def test_falls_back_on_nonfinite_logl(self, sampler):
        # yield_sample re-evaluates non-finite logL point-wise; the fast
        # path must defer to it rather than treat NaN as sub-threshold.
        prop = _PoolProposal([1.0, np.nan, 2.0])
        sampler.proposal = prop
        sampler.logLmin = 0.0
        assert sampler._pop_pool_vectorised() is None
        assert len(prop.indices) == 3
