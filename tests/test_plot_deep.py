"""Deep branch tests for the plotting module.

Mirrors the high-value assertions of the reference's ``test_plot.py``
(616 LoC): bounds/hue/NaN handling, label & colour validation,
unstructured-array conversion, save-vs-return semantics.
"""

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt
import numpy as np
import pytest

from nessai_tpu import config
from nessai_tpu.livepoint import numpy_array_to_live_points
from nessai_tpu.plot import (
    corner_plot,
    nessai_style,
    plot_1d_comparison,
    plot_histogram,
    plot_indices,
    plot_live_points,
    plot_loss,
    plot_trace,
)


@pytest.fixture()
def live_points(rng):
    return numpy_array_to_live_points(
        rng.normal(size=(50, 2)), ["x", "y"]
    )


@pytest.fixture()
def live_points_1(rng):
    return numpy_array_to_live_points(
        rng.normal(loc=1.0, size=(50, 2)), ["x", "y"]
    )


@pytest.fixture(autouse=True)
def _close_figures():
    yield
    plt.close("all")


class TestPlotLivePoints:
    def test_bounds(self, live_points):
        fig = plot_live_points(
            live_points, bounds={"x": [-3, 3], "y": [-3, 3]}
        )
        assert fig is not None

    def test_hue(self, live_points, rng):
        live_points["logL"] = rng.normal(size=50)
        fig = plot_live_points(live_points, c="logL")
        assert fig is not None

    def test_constant_hue_disabled(self, live_points, caplog):
        live_points["logL"] = 1.0
        with caplog.at_level("WARNING"):
            fig = plot_live_points(live_points, c="logL")
        assert fig is not None
        assert "constant" in caplog.text

    def test_nan_column_dropped(self, live_points):
        live_points["y"] = np.nan
        fig = plot_live_points(live_points)
        assert fig is not None

    def test_nan_rows_dropped(self, live_points):
        live_points["y"][:10] = np.nan
        fig = plot_live_points(live_points)
        assert fig is not None

    def test_save(self, live_points, tmp_path):
        out = tmp_path / "lp.png"
        assert plot_live_points(live_points, filename=str(out)) is None
        assert out.exists()


class TestPlot1dComparison:
    def test_unstructured_requires_flag(self, rng):
        with pytest.raises(RuntimeError, match="not structured"):
            plot_1d_comparison(rng.normal(size=(10, 2)))

    def test_unstructured_with_flag(self, rng):
        fig = plot_1d_comparison(
            rng.normal(size=(10, 2)),
            rng.normal(size=(10, 2)),
            convert_to_live_points=True,
        )
        assert fig is not None

    def test_labels_length_validation(self, live_points, live_points_1):
        with pytest.raises(ValueError, match="labels"):
            plot_1d_comparison(
                live_points, live_points_1, labels=["only-one"]
            )

    def test_colours_length_validation(self, live_points, live_points_1):
        with pytest.raises(ValueError, match="colours"):
            plot_1d_comparison(live_points, live_points_1, colours=["C0"])

    def test_custom_labels_and_colours(self, live_points, live_points_1):
        fig = plot_1d_comparison(
            live_points,
            live_points_1,
            labels=["a", "b"],
            colours=["C0", "C3"],
        )
        assert fig is not None

    def test_more_sets_than_palette(self, rng):
        sets = [
            numpy_array_to_live_points(rng.normal(size=(20, 1)), ["x"])
            for _ in range(12)
        ]
        fig = plot_1d_comparison(*sets)
        assert fig is not None

    def test_all_nan_parameter_skipped(
        self, live_points, live_points_1, caplog
    ):
        live_points["x"] = np.nan
        live_points_1["x"] = np.nan
        with caplog.at_level("WARNING"):
            fig = plot_1d_comparison(live_points, live_points_1)
        assert fig is not None
        assert "skipping" in caplog.text

    def test_partial_nan(self, live_points, live_points_1):
        live_points["x"][:25] = np.nan
        fig = plot_1d_comparison(live_points, live_points_1)
        assert fig is not None

    def test_bounds(self, live_points):
        fig = plot_1d_comparison(live_points, bounds={"x": [-3, 3]})
        assert fig is not None

    def test_hist_kwargs_and_save(self, live_points, tmp_path):
        out = tmp_path / "cmp.png"
        assert (
            plot_1d_comparison(
                live_points,
                hist_kwargs={"lw": 2.0},
                filename=str(out),
            )
            is None
        )
        assert out.exists()

    def test_parameter_subset(self, live_points, live_points_1):
        fig = plot_1d_comparison(
            live_points, live_points_1, parameters=["y"]
        )
        assert fig is not None


class TestPlotIndices:
    def test_empty_returns_none(self):
        assert plot_indices([], 100) is None

    def test_breakdown_toggle(self, rng):
        # reference layout (nessai/plot.py:331): hist + ECDF panels,
        # plus a per-batch CDF panel when plot_breakdown is enabled
        idx = rng.integers(0, 100, size=500)
        fig = plot_indices(idx, 100, plot_breakdown=False)
        assert len(fig.axes) == 2
        fig = plot_indices(idx, 100, plot_breakdown=True)
        assert len(fig.axes) == 3

    def test_nlive_estimated_when_missing(self, rng):
        idx = rng.integers(0, 100, size=500)
        fig = plot_indices(idx)
        assert fig is not None

    def test_reference_kwargs(self, rng):
        idx = rng.integers(0, 100, size=500)
        fig = plot_indices(
            idx,
            100,
            ks_test_mode="D-",
            confidence_intervals=(0.9,),
            n_breakdown=4,
            cmap="plasma",
        )
        assert fig is not None

    def test_save(self, rng, tmp_path):
        out = tmp_path / "idx.png"
        assert (
            plot_indices(rng.integers(0, 50, 200), 50, filename=str(out))
            is None
        )
        assert out.exists()


class TestPlotTrace:
    def test_labels(self, rng):
        ns = numpy_array_to_live_points(rng.normal(size=(30, 2)), ["x", "y"])
        fig = plot_trace(-np.arange(30) / 10, ns, labels=["$x$", "$y$"])
        assert fig.axes[0].get_ylabel() == "$x$"

    def test_labels_wrong_length(self, rng):
        ns = numpy_array_to_live_points(rng.normal(size=(30, 2)), ["x", "y"])
        # reference raises RuntimeError (``nessai/plot.py:584``)
        with pytest.raises(RuntimeError, match="wrong length"):
            plot_trace(-np.arange(30) / 10, ns, labels=["only-one"])

    def test_parameter_subset(self, rng):
        ns = numpy_array_to_live_points(rng.normal(size=(30, 2)), ["x", "y"])
        fig = plot_trace(-np.arange(30) / 10, ns, parameters=["y"])
        assert len(fig.axes) == 1

    def test_live_points_overlay(self, rng):
        ns = numpy_array_to_live_points(rng.normal(size=(30, 2)), ["x", "y"])
        lp = numpy_array_to_live_points(rng.normal(size=(10, 2)), ["x", "y"])
        fig = plot_trace(
            -np.arange(30) / 10,
            ns,
            live_points=lp,
            log_x_live_points=-3 - np.arange(10) / 10,
        )
        # nested samples + live points per panel
        assert len(fig.axes[0].lines) == 2

    def test_live_points_without_log_x_raises(self, rng):
        ns = numpy_array_to_live_points(rng.normal(size=(30, 2)), ["x", "y"])
        lp = numpy_array_to_live_points(rng.normal(size=(10, 2)), ["x", "y"])
        with pytest.raises(ValueError, match="log_x_live_points"):
            plot_trace(-np.arange(30) / 10, ns, live_points=lp)


class TestStyleAndMisc:
    def test_nessai_style_disable(self):
        config.plotting.disable_style = True
        try:

            @nessai_style()
            def f():
                return plt.rcParams["axes.prop_cycle"]

            f()
        finally:
            config.plotting.disable_style = False

    def test_plot_loss_symlog(self, tmp_path):
        history = dict(loss=[3.0, 1.0, -2.0], val_loss=[3.5, 1.5, -1.0])
        out = tmp_path / "loss.png"
        assert plot_loss(1, history, filename=str(out)) is None
        assert out.exists()

    def test_plot_histogram(self, rng):
        fig = plot_histogram(rng.normal(size=100), label="x")
        assert fig is not None

    def test_corner_plot_truths(self, live_points, tmp_path):
        out = tmp_path / "corner.png"
        assert (
            corner_plot(
                live_points, truths=[0.0, 0.0], filename=str(out)
            )
            is None
        )
        assert out.exists()


class TestCornerPlotParity:
    """Ports of reference test_plot.py corner_plot cases."""

    @pytest.fixture()
    def live_points(self, rng):
        x = numpy_array_to_live_points(rng.normal(size=(50, 2)), ["x", "y"])
        x["logL"] = rng.normal(size=50)
        return x

    def test_include_and_exclude_error(self, live_points):
        with pytest.raises(
            ValueError, match=r"Cannot specify both `include` and `exclude`"
        ):
            corner_plot(live_points, include=["x"], exclude=["y"])

    def test_include(self, live_points):
        fig = corner_plot(live_points, include=["x", "y"])
        assert fig is not None

    def test_exclude(self, live_points):
        fig = corner_plot(live_points, exclude=["y"])
        assert fig is not None

    def test_truths_list(self, live_points):
        fig = corner_plot(live_points, include=["x", "y"], truths=[0.0, 0.0])
        assert fig is not None

    def test_truths_dict(self, live_points):
        fig = corner_plot(
            live_points, include=["x", "y"], truths={"x": 0.0, "y": 0.0}
        )
        assert fig is not None

    def test_truths_mismatch_error(self, live_points):
        with pytest.raises(ValueError, match=r"truths does not match"):
            corner_plot(live_points, include=["x"], truths=[1, 1])

    def test_no_dynamic_range_removed(self, live_points, caplog):
        live_points["y"] = 1.0
        with caplog.at_level("WARNING"):
            fig = corner_plot(live_points, include=["x", "y"])
        assert fig is not None
        assert "no dynamic range" in caplog.text

    def test_all_nans_column(self, live_points, caplog):
        live_points["y"] = np.nan
        with caplog.at_level("WARNING"):
            fig = corner_plot(live_points, include=["x", "y"])
        assert fig is not None

    def test_truths_filtered_with_range(self, live_points):
        live_points["y"] = 1.0
        fig = corner_plot(
            live_points, include=["x", "y"], truths=[0.0, 1.0]
        )
        assert fig is not None

    def test_save(self, live_points, tmp_path):
        out = tmp_path / "corner.png"
        assert corner_plot(live_points, filename=str(out)) is None
        assert out.exists()

    def test_save_error_warns(self, live_points, caplog, monkeypatch):
        import matplotlib.figure

        def bad_save(self, *args, **kwargs):
            raise ValueError("bad dpi")

        monkeypatch.setattr(matplotlib.figure.Figure, "savefig", bad_save)
        with caplog.at_level("WARNING"):
            out = corner_plot(live_points, filename="corner.png")
        assert out is None
        assert "Could not save corner plot" in caplog.text


class TestTracePlotParity:
    def test_save_error_warns(self, rng, caplog, monkeypatch):
        import matplotlib.figure

        ns = numpy_array_to_live_points(rng.normal(size=(30, 2)), ["x", "y"])

        def bad_save(self, *args, **kwargs):
            raise ValueError("bad dpi")

        monkeypatch.setattr(matplotlib.figure.Figure, "savefig", bad_save)
        with caplog.at_level("WARNING"):
            out = plot_trace(
                -np.arange(30) / 10, ns, filename="trace.png"
            )
        assert out is None
        assert "Could not save trace plot" in caplog.text

    def test_large_dims(self, rng):
        names = [f"x_{i}" for i in range(12)]
        ns = numpy_array_to_live_points(rng.normal(size=(20, 12)), names)
        fig = plot_trace(-np.arange(20) / 10, ns)
        assert len(fig.axes) == 12
