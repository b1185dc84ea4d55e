"""Mixed-plant fleet (parallel/fleet.py): two jitted programs (indy7 6-DOF +
iiwa14 7-DOF) in one process, merged stats, and mesh-sharded equality —
SURVEY.md §7 stage 6, the reference's one-module-at-a-time registration
matrix (python/bindings.cu:220-266) generalized to a concurrent fleet."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gato_tpu.api.config import DEFAULT_SOLVER_PARAMS, INDY7_START_CONFIGS
from gato_tpu.api.common import figure8
from gato_tpu.ops.cost import CostParams
from gato_tpu.parallel.fleet import FleetMember, fleet_report, solve_fleet
from gato_tpu.parallel.sharding import make_mesh
from gato_tpu.robots.model import load_robot
from gato_tpu.solver.types import BSQPSettings, HyperParams


def _member(name, plant, q0, B, N):
    p = DEFAULT_SOLVER_PARAMS
    model = load_robot(plant)
    settings = BSQPSettings(N=N, max_sqp_iters=2, max_pcg_iters=25)
    cp = CostParams.create()
    hp = HyperParams.create(B, rho=p["rho"], mu=p["mu"], pcg_tol=p["pcg_tol"])
    x0 = np.concatenate([q0, np.zeros_like(q0)]).astype(np.float32)
    traj = figure8(0.01).reshape(-1, 6)
    rng = np.random.default_rng(hash(name) % 2**31)
    f_ext = rng.uniform(-5.0, 5.0, (B, 6)).astype(np.float32)
    f_ext[0] = 0.0
    return FleetMember(
        name=name, model=model, settings=settings, cp=cp, hp=hp,
        X=jnp.asarray(np.tile(x0, (B, N, 1))),
        U=jnp.zeros((B, N - 1, model.nu), jnp.float32),
        lam=jnp.zeros((B, N, model.nx), jnp.float32),
        x_s=jnp.asarray(np.tile(x0, (B, 1))),
        ref=jnp.asarray(np.tile(traj[:N], (B, 1, 1)).astype(np.float32)),
        f_ext=jnp.asarray(f_ext), dt=jnp.float32(0.01),
    )


def _fleet(B=8, N=8):
    q_iiwa = np.asarray([0.3, 0.6, 0.0, -1.2, 0.0, 0.8, 0.0], np.float32)
    return [
        _member("indy7", "indy7", INDY7_START_CONFIGS["ready"].astype(
            np.float32), B, N),
        _member("iiwa14", "iiwa14", q_iiwa, B, N),
    ]


def test_mixed_fleet_solve_and_report():
    members = _fleet()
    out, stats = solve_fleet(members)
    assert [m.name for m in out] == ["indy7", "iiwa14"]
    for m, st in zip(out, stats):
        assert m.X.shape == (8, 8, m.model.nx)
        assert np.isfinite(np.asarray(m.X)).all()
        assert np.isfinite(np.asarray(st.final_merit)).all()

    rep = fleet_report(out, stats)
    assert rep["total_lanes"] == 16
    assert set(rep["members"]) == {"indy7", "iiwa14"}
    # the fleet-wide winner is exactly the argmin over the concatenation
    merits = np.concatenate([np.asarray(st.final_merit) for st in stats])
    w = rep["winner"]
    k = int(np.argmin(np.where(np.isfinite(merits), merits, np.inf)))
    assert (w["member"], w["lane"]) == (("indy7", k) if k < 8
                                        else ("iiwa14", k - 8))
    assert w["merit"] == pytest.approx(merits[k])
    # warm state advanced: a second cycle from the solved state still works
    out2, stats2 = solve_fleet(out)
    assert np.isfinite(np.asarray(out2[0].X)).all()


def test_mixed_fleet_report_masks_nan_winner():
    import dataclasses
    members = _fleet()
    out, stats = solve_fleet(members)
    # poison the would-be winner's merit: the report must not select it
    merits0 = np.asarray(stats[0].final_merit).copy()
    merits0[int(np.argmin(merits0))] = np.nan
    stats = [dataclasses.replace(stats[0], final_merit=jnp.asarray(merits0)),
             stats[1]]
    rep = fleet_report(out, stats)
    assert np.isfinite(rep["winner"]["merit"])


def test_mixed_fleet_sharded_matches_unsharded():
    if len(jax.devices()) < 4:
        pytest.skip("needs the virtual multi-device CPU mesh")
    members = _fleet(B=8, N=8)
    out_ref, stats_ref = solve_fleet(members)
    mesh = make_mesh(jax.devices()[:4])
    out_sh, stats_sh = solve_fleet(members, mesh=mesh)
    for a, b, sa, sb in zip(out_ref, out_sh, stats_ref, stats_sh):
        np.testing.assert_allclose(np.asarray(b.X), np.asarray(a.X),
                                   rtol=2e-5, atol=2e-5, equal_nan=False)
        np.testing.assert_allclose(np.asarray(sb.final_merit),
                                   np.asarray(sa.final_merit),
                                   rtol=2e-5, atol=2e-5, equal_nan=False)
    rep_a = fleet_report(out_ref, stats_ref)
    rep_b = fleet_report(out_sh, stats_sh)
    assert rep_a["winner"]["member"] == rep_b["winner"]["member"]
    assert rep_a["winner"]["lane"] == rep_b["winner"]["lane"]
