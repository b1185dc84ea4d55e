"""Per-stage device timing of one BSQP iteration at a given (N, B).

Each stage is chained k times inside one jitted fori_loop with a tiny
data-dependent feedback (so the device cannot overlap or elide repeats), and
timed with utils/timing.py:time_loop_fn — the only trustworthy method on the
tunneled runtime (see CLAUDE.md). Stages are measured on steady-state MPC
inputs produced by the same warmup as bench.py.

Usage: python tools/profile_stages.py --N 32 --B 1 [--stages kkt_array,...]
"""

import argparse
import json

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--N", type=int, default=32)
    ap.add_argument("--B", type=int, default=1)
    ap.add_argument("--plant", default="indy7")
    ap.add_argument("--stages", default="")
    args = ap.parse_args()
    N, B = args.N, args.B

    import jax
    import jax.numpy as jnp

    from gato_tpu.api.common import figure8, rk4_step
    from gato_tpu.api.config import DEFAULT_SOLVER_PARAMS, INDY7_START_CONFIGS
    from gato_tpu.ops.cost import CostParams
    from gato_tpu.robots.model import load_robot
    from gato_tpu.solver.bsqp import solve_batched_jit
    from gato_tpu.solver.types import BSQPSettings, HyperParams
    from gato_tpu.utils.timing import time_loop_fn

    p = DEFAULT_SOLVER_PARAMS
    model = load_robot(args.plant)
    nx, nu, nq = model.nx, model.nu, model.nq
    settings = BSQPSettings(N=N, max_sqp_iters=p["max_sqp_iters"],
                            max_pcg_iters=p["max_pcg_iters"])
    cp = CostParams.create(q_cost=p["q_cost"], qd_cost=p["qd_cost"],
                           u_cost=p["u_cost"], N_cost=p["N_cost"],
                           q_lim_cost=p["q_lim_cost"])
    hp = HyperParams.create(B, rho=p["rho"], mu=p["mu"], pcg_tol=p["pcg_tol"])

    dt = 0.01
    traj = figure8(dt).reshape(-1, 6)
    q0 = INDY7_START_CONFIGS["ready"]
    x0 = np.concatenate([q0, np.zeros(nq)]).astype(np.float32)
    X = jnp.asarray(np.tile(x0, (B, N, 1)))
    U = jnp.zeros((B, N - 1, nu), jnp.float32)
    lam = jnp.zeros((B, N, nx), jnp.float32)
    rng = np.random.default_rng(0)
    f_ext_np = rng.uniform(-5.0, 5.0, (B, 6)).astype(np.float32)
    f_ext_np[0] = 0.0
    f_ext = jnp.asarray(f_ext_np)
    dtj = jnp.float32(dt)

    x_s = jnp.asarray(np.tile(x0, (B, 1)))
    sim = jax.jit(lambda x, u: rk4_step(model, x, u, dtj, substeps=10))
    for step in range(6):
        ref = jnp.asarray(
            np.tile(traj[step:step + N], (B, 1, 1)).astype(np.float32))
        X, U, lam, _, _ = solve_batched_jit(
            model, settings, cp, hp, X, U, lam, x_s, ref, f_ext, dtj)
        x_s = jnp.tile(sim(x_s[0], U[0, 0])[None], (B, 1))
        X = X.at[:, 0, :].set(x_s)
    ref = jnp.asarray(np.tile(traj[step:step + N], (B, 1, 1)).astype(np.float32))

    # ---- materialize steady-state intermediates once ----
    from gato_tpu.ops.kkt import setup_kkt
    from gato_tpu.ops.kkt_fast import setup_kkt_batched
    from gato_tpu.ops.pallas_kkt import setup_kkt_pallas
    from gato_tpu.ops.schur import build_schur, compute_dz
    from gato_tpu.ops.pcg import pcg_solve_batched
    from gato_tpu.ops.pallas_pcg import pcg_solve_batched_pallas
    from gato_tpu.ops.btd_solve import btd_solve_batched
    from gato_tpu.ops.merit import default_alphas
    from gato_tpu.ops.merit_fast import merit_alphas_batched
    from gato_tpu.ops.pallas_merit import merit_alphas_batched_pallas
    from gato_tpu.ops.linesearch import line_search_update

    itype = settings.integrator_type
    alphas = default_alphas(8, dtype=X.dtype)

    kkt_arr = jax.jit(lambda X_, U_: jax.vmap(
        lambda x1, u1, xs1, r1, fe1: setup_kkt(
            model, cp, x1, u1, xs1, r1, fe1, dtj, itype))(X_, U_, x_s, ref, f_ext))
    kkt_chan = jax.jit(lambda X_, U_: setup_kkt_batched(
        model, cp, X_, U_, x_s, ref, f_ext, dtj, itype))
    kkt_pal = jax.jit(lambda X_, U_: setup_kkt_pallas(
        model, cp, X_, U_, x_s, ref, f_ext, dtj, itype))

    kkt0 = kkt_arr(X, U)
    schur_fn = jax.jit(lambda k, r: jax.vmap(
        lambda k1, r1: build_schur(k1, r1, nq, compute_precond=True))(k, r))
    schur_nop_fn = jax.jit(lambda k, r: jax.vmap(
        lambda k1, r1: build_schur(k1, r1, nq, compute_precond=False))(k, r))
    schur0 = schur_fn(kkt0, hp.rho)
    skip0 = jnp.zeros(B, dtype=bool)

    pcg_pal = jax.jit(lambda s, l: pcg_solve_batched_pallas(
        s.S_main, s.S_lower, s.P_main, s.P_lower, s.gamma, l,
        hp.pcg_tol, settings.max_pcg_iters, skip=skip0))
    pcg_xla = jax.jit(lambda s, l: pcg_solve_batched(
        s.S_main, s.S_lower, s.P_main, s.P_lower, s.gamma, l,
        hp.pcg_tol, settings.max_pcg_iters, skip=skip0))
    btd_fn = jax.jit(lambda s, l: btd_solve_batched(
        s.S_main, s.S_lower, s.gamma, l, skip=skip0))

    lam1, iters1 = pcg_pal(schur0, lam)
    print(f"steady-state pcg iters: {np.asarray(iters1)[:4]}")

    dz_fn = jax.jit(lambda k, s, l: jax.vmap(compute_dz)(k, s, l))
    dZX, dZU, _, _ = dz_fn(kkt0, schur0, lam1)

    merit_pal = jax.jit(lambda X_, U_, dx, du: merit_alphas_batched_pallas(
        model, cp, X_, U_, dx, du, x_s, ref, f_ext, hp.mu, dtj, alphas, itype))
    merit_chan = jax.jit(lambda X_, U_, dx, du: merit_alphas_batched(
        model, cp, X_, U_, dx, du, x_s, ref, f_ext, hp.mu, dtj, alphas, itype))
    merits0 = merit_pal(X, U, dZX, dZU)

    ls_fn = jax.jit(lambda m, mb, X_, U_, dx, du, r_, dr_: jax.vmap(
        lambda m1, mb1, X1, U1, dx1, du1, r1, dr1: line_search_update(
            m1, mb1, alphas, X1, U1, dx1, du1, r1, dr1, adapt_rho=True)
    )(m, mb, X_, U_, dx, du, r_, dr_))

    full_fn = jax.jit(lambda X_, U_, l_: solve_batched_jit(
        model, settings, cp, hp, X_, U_, l_, x_s, ref, f_ext, dtj))

    eps = jnp.float32(1e-30)

    def digest(tree):
        """Scalar that depends on EVERY output leaf — defeats XLA DCE of the
        stage body inside the timing loop (a single-element feedback lets the
        compiler strip most of the computation)."""
        leaves = [jnp.sum(l) for l in jax.tree.leaves(tree) if l is not None]
        return eps * sum(jnp.asarray(l, jnp.float32) for l in leaves)

    def loop(fn):
        """time_loop_fn runner for `state -> state` fn."""
        def runner(init):
            @jax.jit
            def run_k(init, k):
                return jax.lax.fori_loop(0, k, lambda _, s: fn(s), init)
            return lambda k: run_k(init, jnp.int32(k))
        return runner

    stages = {}

    def add(name, fn, init):
        stages[name] = (fn, init)

    add("kkt_array", lambda s: s + digest(kkt_arr(X + s, U)), jnp.float32(0))
    add("kkt_chan", lambda s: s + digest(kkt_chan(X + s, U)), jnp.float32(0))
    if jax.default_backend() == "tpu":
        add("kkt_pallas", lambda s: s + digest(kkt_pal(X + s, U)), jnp.float32(0))
    add("schur", lambda s: s + digest(schur_fn(
        jax.tree.map(lambda a: a + s, kkt0), hp.rho)), jnp.float32(0))
    add("schur_noP", lambda s: s + digest(schur_nop_fn(
        jax.tree.map(lambda a: a + s, kkt0), hp.rho)), jnp.float32(0))
    if jax.default_backend() == "tpu":
        add("pcg_pallas", lambda s: s + digest(pcg_pal(
            jax.tree.map(lambda a: None if a is None else a + s, schur0),
            lam + s)), jnp.float32(0))
    add("pcg_xla", lambda s: s + digest(pcg_xla(
        jax.tree.map(lambda a: None if a is None else a + s, schur0),
        lam + s)), jnp.float32(0))
    add("btd", lambda s: s + digest(btd_fn(
        jax.tree.map(lambda a: None if a is None else a + s, schur0),
        lam + s)), jnp.float32(0))
    add("dz", lambda s: s + digest(dz_fn(
        jax.tree.map(lambda a: a + s, kkt0),
        jax.tree.map(lambda a: None if a is None else a + s, schur0),
        lam1 + s)), jnp.float32(0))
    if jax.default_backend() == "tpu":
        add("merit_pallas", lambda s: s + digest(merit_pal(
            X + s, U, dZX, dZU)), jnp.float32(0))
    add("merit_chan", lambda s: s + digest(merit_chan(
        X + s, U, dZX, dZU)), jnp.float32(0))
    add("linesearch", lambda s: s + digest(ls_fn(
        merits0 + s, merits0[:, 0], X, U, dZX, dZU, hp.rho, hp.drho)), jnp.float32(0))
    add("FULL_solve", lambda s: s + digest(full_fn(X + s, U, lam)[:4]), jnp.float32(0))

    want = [s.strip() for s in args.stages.split(",") if s.strip()] or list(stages)
    out = {}
    for name in want:
        fn, init = stages[name]
        try:
            t = time_loop_fn(loop(fn)(init))
            out[name] = round(t * 1e6, 1)
            print(f"{name:14s} {t*1e6:9.1f} us")
        except Exception as e:  # noqa: BLE001
            print(f"{name:14s} FAILED: {type(e).__name__}: {str(e)[:200]}")
    print(json.dumps({"N": N, "B": B, "stages_us": out}))


if __name__ == "__main__":
    main()
