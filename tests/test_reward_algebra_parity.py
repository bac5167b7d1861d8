"""Differential tests of the mo_reward / ma_reward algebra against the
reference implementations: random expression trees evaluated on both
sides must produce identical dense vectors, and the static helpers
(dimension keys, unit spaces, parse) must agree."""

import random

import numpy as np
import pytest

import conftest
from ai_safety_gridworlds_tpu.ma.ma_reward import ma_reward as our_ma
from ai_safety_gridworlds_tpu.mo.mo_reward import mo_reward as our_mo

DIMS = ["GOAL", "STEP", "GOLD", "DANGER", "FOOD"]
AGENTS = ["agent_0", "agent_1"]


def _ref_modules():
    if not conftest.reference_available():
        pytest.skip("reference not mounted")
    conftest.add_reference_to_path()
    from ai_safety_gridworlds.environments.shared.ma_reward import (
        ma_reward as ref_ma,
    )
    from ai_safety_gridworlds.environments.shared.mo_reward import (
        mo_reward as ref_mo,
    )

    return ref_mo, ref_ma


def _rand_expr(depth, mk, rand):
    """One random expression tree, built identically for whichever
    constructor ``mk`` is passed (the RNG fixes the shape)."""
    if depth == 0:
        if rand.random() < 0.3:
            return round(rand.uniform(-3, 3), 3)
        return mk({
            k: round(rand.uniform(-5, 5), 3)
            for k in rand.sample(DIMS, rand.randint(1, 4))
        })
    op = rand.choice(["add", "sub", "mul", "div", "neg"])
    a = _rand_expr(depth - 1, mk, rand)
    if op == "neg":
        return -a
    b = _rand_expr(depth - 1, mk, rand)
    if op in ("mul", "div") and not isinstance(b, (int, float)):
        b = round(rand.uniform(0.5, 3), 3)  # scalar rhs only
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        a = mk({"GOAL": a})
    if op == "add":
        return a + b
    if op == "sub":
        return a - b
    if op == "mul":
        return a * b
    return a / b


def test_mo_reward_random_expression_parity():
    ref_mo, _ = _ref_modules()
    enabled_r = [ref_mo({k: 1}) for k in DIMS]
    enabled_o = [our_mo({k: 1}) for k in DIMS]
    for trial in range(300):
        r = _rand_expr(3, ref_mo, random.Random(trial))
        o = _rand_expr(3, our_mo, random.Random(trial))
        if isinstance(r, (int, float)):
            assert abs(r - o) < 1e-9
            continue
        np.testing.assert_allclose(
            np.asarray(r.tolist(enabled_r), float),
            np.asarray(o.tolist(enabled_o), float),
            atol=1e-9, err_msg=f"trial {trial}",
        )


def test_mo_reward_static_helpers_parity():
    ref_mo, _ = _ref_modules()
    pairs = [
        ([{"B": 1, "A": 2}, {"C": -1}]),
        ([{"Z": 0.5}, {"A": -2, "Z": 3}]),
    ]
    for dicts in pairs:
        er = [ref_mo(d) for d in dicts]
        eo = [our_mo(d) for d in dicts]
        assert (
            ref_mo.get_enabled_reward_dimension_keys(er)
            == our_mo.get_enabled_reward_dimension_keys(eo)
        )
        assert (
            ref_mo.get_enabled_reward_unit_space(er)
            == our_mo.get_enabled_reward_unit_space(eo)
        )
    s = "{'GOAL': 2.5, 'STEP': -1}"
    enabled_r = [ref_mo({k: 1}) for k in DIMS]
    enabled_o = [our_mo({k: 1}) for k in DIMS]
    assert ref_mo.parse(s).tofull(enabled_r) == our_mo.parse(s).tofull(
        enabled_o
    )
    assert ref_mo.parse("").tolist(enabled_r) == our_mo.parse("").tolist(
        enabled_o
    )


def test_ma_reward_random_expression_parity():
    ref_mo, ref_ma = _ref_modules()

    def mk_pair(ctor_ma, ctor_mo, rand):
        return ctor_ma({
            a: ctor_mo({
                k: round(rand.uniform(-5, 5), 3)
                for k in rand.sample(DIMS, rand.randint(1, 3))
            })
            for a in rand.sample(AGENTS, rand.randint(1, 2))
        })

    enabled_r = {a: [ref_mo({k: 1}) for k in DIMS] for a in AGENTS}
    enabled_o = {a: [our_mo({k: 1}) for k in DIMS] for a in AGENTS}
    for trial in range(200):
        r1 = mk_pair(ref_ma, ref_mo, random.Random(trial))
        r2 = mk_pair(ref_ma, ref_mo, random.Random(trial + 1000))
        o1 = mk_pair(our_ma, our_mo, random.Random(trial))
        o2 = mk_pair(our_ma, our_mo, random.Random(trial + 1000))
        s = round(random.Random(trial + 2000).uniform(0.5, 2), 3)
        r = (r1 + r2) * s - r1
        o = (o1 + o2) * s - o1
        rl = r.tolist(enabled_r)
        ol = o.tolist(enabled_o)
        assert sorted(rl.keys()) == sorted(ol.keys()), trial
        for a in rl:
            np.testing.assert_allclose(
                np.asarray(rl[a], float), np.asarray(ol[a], float),
                atol=1e-9, err_msg=f"trial {trial} {a}",
            )
