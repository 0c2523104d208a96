"""Self-tests for the local oracle harness's value compare.

Round-7 verdict item 2: the old normalization converted Decimal to
float, which masked the decimal-SCALE drift that reached the driver
(viewdef_observation_components, DECIMAL(38,18) vs DECIMAL(18,2)).
These tests pin the harness to be representation-exact on decimals —
a deliberately mis-scaled result MUST fail locally — while keeping a
warned lenient path for cross-engine numeric-family differences.
"""

from decimal import Decimal

from tools.check_oracles import compare, norm_cell


def test_decimal_scale_mismatch_fails():
    # same VALUE, different scale — the exact drift that hit the driver
    s = [("a", Decimal("90.000000000000000000"))]
    d = [("a", Decimal("90.00"))]
    problems, warnings = compare(["k", "v"], s, ["k", "v"], d)
    assert problems, "mis-scaled decimals must fail the exact compare"
    assert any("values" in p for p in problems)
    assert not warnings


def test_decimal_same_scale_passes():
    s = [("a", Decimal("90.00")), ("b", Decimal("-1.25"))]
    d = [("b", Decimal("-1.25")), ("a", Decimal("90.00"))]
    problems, warnings = compare(["k", "v"], s, ["k", "v"], d)
    assert not problems
    assert not warnings


def test_mixed_family_is_lenient_but_warned():
    # spark returns float, oracle returns Decimal: numerically equal —
    # lenient compare passes but surfaces a warning
    s = [("a", 90.0)]
    d = [("a", Decimal("90.00"))]
    problems, warnings = compare(["k", "v"], s, ["k", "v"], d)
    assert not problems
    assert warnings and "numeric family differs" in warnings[0]


def test_mixed_family_still_catches_value_drift():
    s = [("a", 90.5)]
    d = [("a", Decimal("90.00"))]
    problems, _ = compare(["k", "v"], s, ["k", "v"], d)
    assert problems


def test_decimal_inside_arrays_is_exact():
    s = [("a", [Decimal("1.0")])]
    d = [("a", [Decimal("1.00")])]
    problems, _ = compare(["k", "v"], s, ["k", "v"], d)
    assert problems


def test_norm_cell_decimal_fixed_point():
    # Decimal str() can use E-notation (9E+1); the harness must render
    # fixed-point so equal-scale values collide regardless of form
    assert norm_cell(Decimal("9E+1")) == "dec:90"
    assert norm_cell(Decimal("90")) == "dec:90"
    assert norm_cell(Decimal("90.00")) == "dec:90.00"


def test_rowcount_and_cols_still_checked():
    problems, _ = compare(["k"], [(1,)], ["k"], [(1,), (2,)])
    assert any("rowcount" in p for p in problems)
    problems, _ = compare(["k"], [(1,)], ["j"], [(1,)])
    assert any("cols" in p for p in problems)
