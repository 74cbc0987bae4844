"""Reference-parity behaviour tests for the base ``Reparameterisation``.

Mirrors ``/root/reference/tests/test_reparameterisations/
test_base_reparameterisation.py`` against this package's API.
"""

import numpy as np
import pytest
from numpy.testing import assert_equal

from nessai_tpu.livepoint import empty_structured_array
from nessai_tpu.reparameterisations import Reparameterisation


class BoundedReparam(Reparameterisation):
    requires_bounded_prior = True


@pytest.mark.parametrize("name", ["x1", ["x1"]])
@pytest.mark.parametrize("prior_bounds", [[0, 1], (0, 1), {"x1": [0, 1]}])
def test_init(name, prior_bounds):
    reparam = Reparameterisation(parameters=name, prior_bounds=prior_bounds)
    assert reparam.input_parameters == ["x1"]
    assert reparam.output_parameters == ["x1_prime"]
    assert_equal(reparam.prior_bounds, {"x1": np.array([0.0, 1.0])})


def test_init_infinite_bounds():
    reparam = Reparameterisation(
        parameters=["x", "y"], prior_bounds={"x": [0, 1], "y": [0, np.inf]}
    )
    assert reparam.input_parameters == ["x", "y"]
    assert reparam.output_parameters == ["x_prime", "y_prime"]
    assert_equal(reparam.prior_bounds["x"], [0, 1])
    assert_equal(reparam.prior_bounds["y"], [0, np.inf])


def test_infinite_bounds_error():
    with pytest.raises(RuntimeError, match="requires finite prior"):
        BoundedReparam(
            parameters=["x", "y"],
            prior_bounds={"x": [0, 1], "y": [0, np.inf]},
        )


def test_no_prior_bounds():
    class FreeReparam(Reparameterisation):
        requires_bounded_prior = False

    reparam = FreeReparam(parameters=["x", "y"])
    assert reparam.prior_bounds is None


def test_no_prior_bounds_error():
    with pytest.raises(RuntimeError, match="requires prior bounds"):
        BoundedReparam(parameters=["x", "y"])


def test_parameters_error():
    with pytest.raises(TypeError, match="Parameters must be a str or list"):
        Reparameterisation(parameters={"x": [0, 1]})


def test_missing_bounds():
    with pytest.raises(RuntimeError, match="Mismatch"):
        BoundedReparam(parameters=["x", "y"], prior_bounds={"x": [0, 1]})


def test_missing_bounds_allowed_for_auxiliary_parameters():
    reparam = Reparameterisation(
        parameters=["x", "aux"], prior_bounds={"x": [0, 1]}
    )
    assert_equal(reparam.prior_bounds, {"x": np.array([0.0, 1.0])})


def test_conflicting_parameters_and_input_parameters():
    with pytest.raises(
        RuntimeError, match="Received conflicting values for `parameters`"
    ):
        Reparameterisation(
            parameters=["x"],
            input_parameters=["y"],
            prior_bounds={"y": [0, 1]},
        )


def test_matching_parameters_and_input_parameters():
    reparam = Reparameterisation(
        parameters=["x"],
        input_parameters=["x"],
        prior_bounds={"x": [0, 1]},
    )
    assert reparam.input_parameters == ["x"]


def test_persistent_parameters_must_be_subset():
    with pytest.raises(
        RuntimeError,
        match="Persistent parameters must be a subset of the input",
    ):
        Reparameterisation(
            parameters=["x"],
            persistent_parameters=["y"],
            prior_bounds={"x": [0, 1]},
        )


def test_incorrect_bounds_type():
    with pytest.raises(TypeError, match="Prior bounds must be"):
        Reparameterisation(parameters=["x", "y"], prior_bounds=1)


def test_incorrect_bounds_length():
    with pytest.raises(
        RuntimeError, match="Prior bounds got a list of len > 2"
    ):
        Reparameterisation(parameters=["x", "y"], prior_bounds=[1, 2, 3])


def test_methods_not_implemented():
    reparam = Reparameterisation(parameters="x", prior_bounds=[0, 1])
    with pytest.raises(NotImplementedError):
        reparam.reparameterise(None, None, None)
    with pytest.raises(NotImplementedError):
        reparam.inverse_reparameterise(None, None, None)


def test_output_parameters():
    reparam = Reparameterisation(
        parameters=["x"], prior_bounds={"x": [0, 1]}
    )
    reparam.auxiliary_parameters = ["x_aux"]
    assert reparam.output_parameters == ["x_prime"]
    assert reparam.x_output_parameters == ["x", "x_aux"]


def test_output_parameters_override():
    reparam = Reparameterisation(
        parameters=["x"],
        output_parameters=["u"],
        prior_bounds={"x": [0, 1]},
    )
    assert reparam.output_parameters == ["u"]
    assert reparam.prime_parameters == ["u"]


def test_format_parameters_invalid_type():
    with pytest.raises(TypeError, match="Parameters must be a string"):
        Reparameterisation._format_parameters(1)


def test_update_and_reset_noop():
    reparam = Reparameterisation(parameters="x", prior_bounds=[0, 1])
    x = np.array((1, 2), dtype=[("x", "f8"), ("y", "f8")])
    reparam.update(x)
    reparam.reset()


def test_name():
    reparam = Reparameterisation(
        parameters=["x", "y"], prior_bounds={"x": [0, 1], "y": [0, 1]}
    )
    assert reparam.name == "reparameterisation_x_y"


def test_resolve_forward_input_spaces():
    reparam = Reparameterisation(
        input_parameters=["x", "x_prime", "missing"],
        persistent_parameters=["x", "x_prime"],
        prior_bounds={"x": [0, 1]},
    )
    missing = reparam.resolve_forward_input_spaces(
        available_parameters=["x", "y"],
        available_prime_parameters=["x_prime", "y_prime"],
    )
    assert missing == ["missing"]
    assert reparam.x_input_parameters == ["x"]
    assert reparam.x_prime_input_parameters == ["x_prime"]
    assert reparam.x_persistent_parameters == ["x"]
    assert reparam.x_prime_persistent_parameters == ["x_prime"]


def test_resolve_inverse_input_spaces():
    reparam = Reparameterisation(
        parameters=["x"],
        inverse_input_parameters=["y", "y_prime", "missing"],
        prior_bounds={"x": [0, 1]},
    )
    missing = reparam.resolve_inverse_input_spaces(
        available_parameters=["x", "y"],
        available_prime_parameters=["x_prime", "y_prime"],
    )
    assert missing == ["missing"]
    assert reparam.x_inverse_input_parameters == ["y"]
    assert reparam.x_prime_inverse_input_parameters == ["y_prime"]


def test_unresolved_x_input_parameters_default():
    reparam = Reparameterisation(
        parameters=["x"], prior_bounds={"x": [0, 1]}
    )
    assert reparam.x_input_parameters == ["x"]
    assert reparam.x_prime_input_parameters == []


def test_get_parameter_value_from_x():
    reparam = Reparameterisation(parameters=["x"], prior_bounds={"x": [0, 1]})
    x = empty_structured_array(2, names=["x"])
    x["x"] = np.array([1.0, 2.0])
    out = reparam.get_parameter_value("x", x)
    np.testing.assert_array_equal(out, np.asarray(x["x"], float))


def test_get_parameter_value_from_x_prime():
    reparam = Reparameterisation(parameters=["x"], prior_bounds={"x": [0, 1]})
    reparam.resolve_forward_input_spaces([], ["x"])
    x = empty_structured_array(2, names=["x"])
    x["x"] = np.array([1.0, 2.0])
    x_prime = empty_structured_array(2, names=["x"])
    x_prime["x"] = np.array([3.0, 4.0])
    out = reparam.get_parameter_value("x", x, x_prime=x_prime)
    np.testing.assert_array_equal(out, np.asarray(x_prime["x"], float))


def test_get_parameter_value_from_x_prime_missing_array():
    reparam = Reparameterisation(parameters=["x"], prior_bounds={"x": [0, 1]})
    reparam.resolve_forward_input_spaces([], ["x"])
    x = empty_structured_array(2, names=["x"])
    with pytest.raises(RuntimeError, match="no x_prime array was provided"):
        reparam.get_parameter_value("x", x)


def test_set_parameter_value_in_x():
    reparam = Reparameterisation(parameters=["x"], prior_bounds={"x": [0, 1]})
    x = empty_structured_array(2, names=["x"])
    x_out, x_prime_out = reparam.set_parameter_value(
        "x", np.array([1.0, 2.0]), x
    )
    np.testing.assert_array_equal(x_out["x"], np.array([1.0, 2.0]))
    assert x_prime_out is None


def test_set_parameter_value_in_x_prime():
    reparam = Reparameterisation(parameters=["x"], prior_bounds={"x": [0, 1]})
    reparam.resolve_forward_input_spaces([], ["x"])
    x = empty_structured_array(2, names=["x"])
    x_prime = empty_structured_array(2, names=["x"])
    x_out, x_prime_out = reparam.set_parameter_value(
        "x", np.array([3.0, 4.0]), x, x_prime=x_prime
    )
    np.testing.assert_array_equal(x_prime_out["x"], np.array([3.0, 4.0]))
    assert x_out is x


def test_set_parameter_value_in_x_prime_missing_array():
    reparam = Reparameterisation(parameters=["x"], prior_bounds={"x": [0, 1]})
    reparam.resolve_forward_input_spaces([], ["x"])
    x = empty_structured_array(2, names=["x"])
    with pytest.raises(RuntimeError, match="no x_prime array was provided"):
        reparam.set_parameter_value("x", np.array([1.0, 2.0]), x)
