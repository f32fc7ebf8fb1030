"""Fused, jitted training steps — the TPU-native performance path.

The reference trains with an eager per-iteration loop (torch autograd tape:
``examples/runner.py:124-187``).  JAX has no tape, so sampling and the ELBO
are fused into one differentiated, jit-compiled function per method:

  * ``vi``  — reparameterised sample; ∇ of the ELBO w.r.t. opt params.
  * ``rws`` — detached sample; ∇ flows through logP/logQ only (wake-sleep).
  * ``qem`` — detached sample; posterior sufficient-stat moments via the
              source-term trick, EMA'd and converted to conventional params.

Each factory returns ``(step, state0)``; ``step(state, key) -> (state, elbo)``
is a pure function that compiles to a single XLA program (sampling, the
whole K contraction, backward pass and the optimizer update included).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

try:
    import optax
except ImportError:  # pragma: no cover
    optax = None

import contextlib

from .sample import Sample
from .sampler import PermutationSampler
from .split import no_checkpoint


def _plan_active(mesh_plan):
    """Trace under the plan so the engine can route e.g. the timeseries
    chain contraction to its T-sharded implementation."""
    return mesh_plan.active() if mesh_plan is not None else contextlib.nullcontext()


def _make_sample(problem, K, reparam, sampler, key, stateP, stateQ,
                 mesh_plan=None):
    tree, gv2K = problem.Q._sample(K, reparam, sampler, problem.all_platedims,
                                   key, state=stateQ)
    if mesh_plan is not None:
        tree = mesh_plan.constrain_tree(tree)
    return Sample(problem, tree, gv2K, sampler, reparam,
                  states=(stateP, stateQ))


def elbo_fn(problem, K, reparam=True, sampler=PermutationSampler,
            computation_strategy=no_checkpoint, mesh_plan=None):
    """Pure function ``(stateP, stateQ, key) -> elbo`` fusing sampling and
    the logPQ contraction.  With a ``MeshPlan``, the sampled particles and
    data are sharding-constrained so GSPMD distributes the contraction."""
    def f(stateP, stateQ, key):
        with _plan_active(mesh_plan):
            s = _make_sample(problem, K, reparam, sampler, key, stateP,
                             stateQ, mesh_plan)
            sample = s.reparam_sample if reparam else s.detached_sample
            return s._elbo(sample, None, computation_strategy)
    return f


def _strong(tree):
    """Strip ``weak_type`` from every array leaf of an initial state.

    Leaves created from python scalars are weak-typed; after one update they
    come back strong-typed, so the second ``step`` call would see different
    avals and silently recompile the whole program — a one-off multi-second
    stall that dominated short runs (observed: covid RWS at 1-3 s/step mean
    over 10 iters vs 2 ms steady-state)."""
    return jax.tree.map(
        lambda x: jax.lax.convert_element_type(x, jnp.result_type(x)), tree)


def _merge_opt(stateP, stateQ):
    return {"P": stateP["opt"], "Q": stateQ["opt"]}


def _split_opt(params, stateP, stateQ):
    newP = {**stateP, "opt": params["P"]}
    newQ = {**stateQ, "opt": params["Q"]}
    return newP, newQ


def vi(problem, K: int, lr=0.01, optimizer=None,
       sampler=PermutationSampler, computation_strategy=no_checkpoint,
       mesh_plan=None):
    """Jitted reparameterised-VI step factory."""
    if optimizer is None:
        if optax is None:
            raise RuntimeError("optax unavailable; pass an explicit optimizer")
        optimizer = optax.adam(lr)
    f = elbo_fn(problem, K, True, sampler, computation_strategy, mesh_plan)

    def loss(params, stateP, stateQ, key):
        sP, sQ = _split_opt(params, stateP, stateQ)
        return -f(sP, sQ, key)

    @jax.jit
    def step(state, key):
        stateP, stateQ, opt_state = state
        params = _merge_opt(stateP, stateQ)
        neg_elbo, grads = jax.value_and_grad(loss)(params, stateP, stateQ, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        stateP, stateQ = _split_opt(params, stateP, stateQ)
        return (stateP, stateQ, opt_state), -neg_elbo

    state0 = _strong((problem.P.state(), problem.Q.state(),
                      optimizer.init(_merge_opt(problem.P.state(),
                                                problem.Q.state()))))
    return step, state0


def rws(problem, K: int, lr=0.01, optimizer=None,
        sampler=PermutationSampler, computation_strategy=no_checkpoint,
        mesh_plan=None):
    """Jitted reweighted-wake-sleep step factory.

    Wake-phase P update *ascends* the ELBO; wake-phase Q update *descends* it
    (equivalently, ascends the importance-weighted log Q) — the reference's
    maximize=True Adam on P params and maximize=False on Q params
    (``examples/simple_examples/example.py``)."""
    if optimizer is None:
        if optax is None:
            raise RuntimeError("optax unavailable; pass an explicit optimizer")
        optimizer = optax.adam(lr)
    f = elbo_fn(problem, K, False, sampler, computation_strategy, mesh_plan)

    def elbo_of(params, stateP, stateQ, key):
        sP, sQ = _split_opt(params, stateP, stateQ)
        return f(sP, sQ, key)

    @jax.jit
    def step(state, key):
        stateP, stateQ, opt_state = state
        params = _merge_opt(stateP, stateQ)
        elbo, g = jax.value_and_grad(elbo_of)(params, stateP, stateQ, key)
        # per-branch objective: minimise -elbo for P, minimise +elbo for Q
        grads = {"P": jax.tree.map(lambda x: -x, g["P"]), "Q": g["Q"]}
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        stateP, stateQ = _split_opt(params, stateP, stateQ)
        return (stateP, stateQ, opt_state), elbo

    state0 = _strong((problem.P.state(), problem.Q.state(),
                      optimizer.init(_merge_opt(problem.P.state(),
                                                problem.Q.state()))))
    return step, state0


def qem(problem, K: int, lr=0.1, sampler=PermutationSampler,
        computation_strategy=no_checkpoint, mesh_plan=None):
    """Jitted QEM (natural-gradient moment-matching) step factory
    (reference training loop ``examples/runner.py:178-187`` +
    ``BoundPlate.py:256-296``, here one fused XLA program per step).

    ``lr`` may be a float (the reference's fixed-lr EMA), a callable
    ``t -> lr_t``, or a schedule string:

    * ``"1/t"`` — Robbins–Monro averaging from the start
      (``lr_t = 1/(t+1)``; the EMA becomes an exact running average).
    * ``"<lr0>/t@<T0>"``, e.g. ``"0.1/t@200"`` — **delayed averaging**:
      fixed ``lr0`` burn-in until iteration ``T0`` (while Q is still
      moving), then ``lr_t = 1/(t − T0 + 1/lr0)`` (continuous at the
      switch).  This fixes fixed-lr QEM's late-training *drift*: measured
      on full-size MovieLens K=30 (v5e), fixed lr=0.1 bottoms out at 6.3%
      relative moment error at iter ~350 and wanders back up to 31% by
      iter 1500, while ``"0.1/t@200"`` descends to the same ~6% floor and
      stays there.  (The floor itself is finite-K proposal bias, which no
      schedule removes — raise K for a lower floor.)

    With a schedule the returned state is ``((stateP, stateQ), t)``.
    """
    import re
    import jax.numpy as jnp
    schedule = None
    if callable(lr):
        schedule = lr
    elif isinstance(lr, str):
        if lr == "1/t":
            schedule = lambda t: 1.0 / (t + 1.0)
        else:
            m = re.fullmatch(r"([0-9.]+)/t@([0-9]+)", lr)
            if not m:
                raise ValueError(
                    f"unknown qem lr schedule {lr!r} "
                    f"(expected '1/t' or '<lr0>/t@<T0>')")
            lr0, T0 = float(m.group(1)), float(m.group(2))
            schedule = lambda t: jnp.where(t < T0, lr0,
                                           1.0 / (t - T0 + 1.0 / lr0))

    @jax.jit
    def step(state, key):
        if schedule is not None:
            state, t = state
            lr_t = schedule(t)
        else:
            lr_t = lr
        stateP, stateQ = state
        with _plan_active(mesh_plan):
            s = _make_sample(problem, K, False, sampler, key, stateP, stateQ,
                             mesh_plan)
            # ONE fused value_and_grad pass: the zero J source terms make
            # the loss value the plain ELBO while its gradient reads off
            # P's AND Q's posterior sufficient-stat moments (vs 3 forwards
            # + 2 backwards when computed separately)
            rmP = problem.P.qem_flat_list_rmkeys
            rmQ = problem.Q.qem_flat_list_rmkeys
            if rmP or rmQ:
                elbo, all_moments = s._moments_and_elbo(
                    list(rmP) + list(rmQ), computation_strategy)
                momP, momQ = all_moments[:len(rmP)], all_moments[len(rmP):]
            else:
                elbo = s._elbo(s.detached_sample, None, computation_strategy)
                momP = momQ = None
            newP = problem.P._updated_qem_state(lr_t, s, computation_strategy,
                                                state=stateP, moments=momP)
            newQ = problem.Q._updated_qem_state(lr_t, s, computation_strategy,
                                                state=stateQ, moments=momQ)
        if schedule is not None:
            return ((newP, newQ), t + 1.0), elbo
        return (newP, newQ), elbo

    state0 = _strong((problem.P.state(), problem.Q.state()))
    if schedule is not None:
        state0 = (state0, jnp.zeros((), jnp.float32))
    return step, state0


def _make_nonmp(problem, K, reparam, key, stateP, stateQ):
    from .sample_nonmp import SampleNonMP
    from .sampler import IndependentSampler
    tree, gv2K = problem.Q._sample(K, reparam, IndependentSampler,
                                   problem.all_platedims, key, state=stateQ)
    s = SampleNonMP(problem, tree, gv2K, reparam)
    s._states = (stateP, stateQ)
    return s


def global_elbo_fn(problem, K, reparam=True):
    """Non-MP (global single-K, IWAE-style) ELBO as a pure function
    (reference ``basic_runner.py`` global_* methods)."""
    def f(stateP, stateQ, key):
        s = _make_nonmp(problem, K, reparam, key, stateP, stateQ)
        sample = s.reparam_sample if reparam else s.detached_sample
        return s._elbo(sample)
    return f


def global_vi(problem, K: int, lr=0.01, optimizer=None, **_):
    if optimizer is None:
        optimizer = optax.adam(lr)
    f = global_elbo_fn(problem, K, True)

    def loss(params, stateP, stateQ, key):
        sP, sQ = _split_opt(params, stateP, stateQ)
        return -f(sP, sQ, key)

    @jax.jit
    def step(state, key):
        stateP, stateQ, opt_state = state
        params = _merge_opt(stateP, stateQ)
        neg_elbo, grads = jax.value_and_grad(loss)(params, stateP, stateQ, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        stateP, stateQ = _split_opt(params, stateP, stateQ)
        return (stateP, stateQ, opt_state), -neg_elbo

    state0 = _strong((problem.P.state(), problem.Q.state(),
                      optimizer.init(_merge_opt(problem.P.state(),
                                                problem.Q.state()))))
    return step, state0


def global_rws(problem, K: int, lr=0.01, optimizer=None, **_):
    if optimizer is None:
        optimizer = optax.adam(lr)
    f = global_elbo_fn(problem, K, False)

    def elbo_of(params, stateP, stateQ, key):
        sP, sQ = _split_opt(params, stateP, stateQ)
        return f(sP, sQ, key)

    @jax.jit
    def step(state, key):
        stateP, stateQ, opt_state = state
        params = _merge_opt(stateP, stateQ)
        elbo, g = jax.value_and_grad(elbo_of)(params, stateP, stateQ, key)
        grads = {"P": jax.tree.map(lambda x: -x, g["P"]), "Q": g["Q"]}
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        stateP, stateQ = _split_opt(params, stateP, stateQ)
        return (stateP, stateQ, opt_state), elbo

    state0 = _strong((problem.P.state(), problem.Q.state(),
                      optimizer.init(_merge_opt(problem.P.state(),
                                                problem.Q.state()))))
    return step, state0


def global_qem(problem, K: int, lr=0.1, **_):
    @jax.jit
    def step(state, key):
        stateP, stateQ = state
        s = _make_nonmp(problem, K, False, key, stateP, stateQ)
        newP = problem.P._updated_qem_state(lr, s, no_checkpoint, state=stateP)
        newQ = problem.Q._updated_qem_state(lr, s, no_checkpoint, state=stateQ)
        elbo = s._elbo(s.detached_sample)
        return (newP, newQ), elbo

    state0 = _strong((problem.P.state(), problem.Q.state()))
    return step, state0


def scan_steps(step, n_steps: int, unroll: int | None = None):
    """Fuse ``n_steps`` training steps into ONE XLA program via ``lax.scan``.

    ``step(state, key) -> (state, elbo)`` (any factory's output) becomes
    ``run(state, key) -> (state, elbos[n_steps])`` where step ``i`` uses
    ``fold_in(key, i)`` — the same key schedule as the eager loop in ``fit``.

    This is the TPU execution mode the reference's eager per-iteration loop
    (``examples/runner.py:178-187``) cannot express: a whole training segment
    compiles to a single device program, so per-step host dispatch (dominant
    at small K — the MovieLens K=30 step computes in ~0.3 ms) disappears
    entirely, and XLA can overlap/pipeline across iterations.

    ``unroll=None`` defaults to 4 on TPU and 1 elsewhere: the small-step
    regime is while-loop-overhead bound — unrolling step bodies measured
    ~1.15x on the movielens K=30 headline loop with median-slope timing
    (451 -> 377-393 us/step at unroll 2/4/8, all within jitter of each
    other; results/scan_unroll_bench.json.  The earlier 1.67x/204 us
    record was a stall-deflated min-slope, withdrawn in round 5) —
    but a 4x scan body also compiles ~4x slower, which is pure cost on the
    CPU test mesh.  n_steps not divisible by unroll falls back to the
    exact remainder handling inside lax.scan."""
    if unroll is None:
        unroll = 4 if jax.devices()[0].platform == "tpu" else 1
    inner = getattr(step, "__wrapped__", step)  # avoid jit-within-jit retrace

    @jax.jit
    def run(state, key):
        keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
            jnp.arange(n_steps))
        state, elbos = jax.lax.scan(inner, state, keys,
                                    unroll=min(unroll, n_steps))
        return state, elbos

    return run


def vmap_runs(step, n_steps: int, n_runs: int, unroll: int = 1):
    """Run ``n_runs`` independent training runs of ``n_steps`` each as ONE
    XLA program: ``vmap`` over per-run keys of the ``lax.scan``-fused loop.

    The reference executes its seed grids serially, one eager run at a time
    (``examples/runner.py:104-222``); at small K a single run leaves the MXU
    idle, so batching whole runs is nearly free on-chip.  Run ``r`` uses key
    ``fold_in(key, r)`` and its step ``i`` uses ``fold_in(fold_in(key, r), i)``
    — identical to calling ``scan_steps(step, n_steps)(state0, fold_in(key, r))``
    per run (tested).

    Returns ``many(state0, key) -> (states, elbos)`` with every leaf of
    ``states`` and ``elbos`` carrying a leading ``n_runs`` axis."""
    inner = getattr(step, "__wrapped__", step)

    def one(state, key):
        keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
            jnp.arange(n_steps))
        return jax.lax.scan(inner, state, keys, unroll=unroll)

    @jax.jit
    def many(state0, key):
        run_keys = jax.vmap(lambda r: jax.random.fold_in(key, r))(
            jnp.arange(n_runs))
        return jax.vmap(one, in_axes=(None, 0))(state0, run_keys)

    return many


def fit(problem, method="vi", K=10, iters=100, lr=None, key=None,
        fuse_iters=False, **kwargs):
    """Convenience loop: run ``iters`` fused steps, write the final state back
    into the problem's BoundPlates, return the per-iteration ELBOs.

    ``fuse_iters=True`` runs all iterations inside one ``lax.scan`` program
    (see ``scan_steps``) — fastest when per-step compute is small; the eager
    loop (default) lets callers interleave host-side work per iteration."""
    if key is None:
        key = jax.random.key(0)
    defaults = {"vi": 0.01, "rws": 0.01, "qem": 0.1,
                "global_vi": 0.01, "global_rws": 0.01, "global_qem": 0.1}
    lr = lr if lr is not None else defaults[method]
    factory = {"vi": vi, "rws": rws, "qem": qem, "global_vi": global_vi,
               "global_rws": global_rws, "global_qem": global_qem}[method]
    step, state = factory(problem, K, lr=lr, **kwargs)
    if fuse_iters:
        state, elbos = scan_steps(step, iters)(state, key)
        elbos = list(elbos)
    else:
        elbos = []
        for i in range(iters):
            state, elbo = step(state, jax.random.fold_in(key, i))
            elbos.append(elbo)
    if method in ("vi", "rws", "global_vi", "global_rws"):
        stateP, stateQ, _ = state
    else:
        if len(state) == 2 and not hasattr(state[1], "keys"):
            state, _ = state          # qem lr schedule: ((sP, sQ), t)
        stateP, stateQ = state
    problem.P.set_state(stateP)
    problem.Q.set_state(stateQ)
    return jnp.stack(elbos)
