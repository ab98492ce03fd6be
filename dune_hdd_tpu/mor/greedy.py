"""Greedy reduced-basis training (standard RB and LRBMS variants).

Re-design of the pyMOR workflows the reference drives through its Python
bindings (examples/linearelliptic/thermalblock_main.py):

* perform_standard_rb (:82-188): greedy over a training set with
  gram_schmidt/pod/trivial extension, h1_semi/l2 error norms,
  max_rb_size/target_error stopping.
* perform_lrbms (:191-295): greedy with per-subdomain local bases extended
  with per-subdomain local products (d.local_product(ss, id)), initial basis
  from the local rhs, optional final POD compression.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from .gram_schmidt import gram_schmidt, pod, trivial_extension
from .reductor import RBReductor, ReducedModel

__all__ = ["GreedyResult", "greedy_rb", "greedy_lrbms", "sample_uniformly", "sample_randomly"]


@dataclass
class GreedyResult:
    reduced_model: ReducedModel
    basis: jnp.ndarray
    max_errors: List[float] = field(default_factory=list)
    selected_mus: List[dict] = field(default_factory=list)
    extensions: int = 0


def sample_uniformly(parameter_type, low: float, high: float, count: int) -> List[dict]:
    """Tensor-free uniform sampling: `count` points per scalar ramp, shared
    across components (CubicParameterSpace.sample_uniformly analog)."""
    out = []
    for t in np.linspace(low, high, count):
        out.append({name: jnp.full(size, float(t)) for name, size in parameter_type.items()})
    return out


def sample_randomly(parameter_type, low: float, high: float, count: int,
                    seed: int = 0) -> List[dict]:
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(count):
        out.append(
            {name: jnp.asarray(rng.uniform(low, high, size))
             for name, size in parameter_type.items()}
        )
    return out


def _extend(basis, new_vec, algorithm: str, product):
    if algorithm == "trivial":
        return trivial_extension(basis, new_vec)
    if algorithm == "gram_schmidt":
        stacked = (
            jnp.concatenate([basis, new_vec[None, :]]) if basis.shape[0] else new_vec[None, :]
        )
        return gram_schmidt(stacked, product)
    if algorithm == "pod":
        stacked = (
            jnp.concatenate([basis, new_vec[None, :]]) if basis.shape[0] else new_vec[None, :]
        )
        modes, _ = pod(stacked, product)
        return modes
    raise ValueError(f"unknown extension algorithm {algorithm!r}")


def greedy_rb(
    discretization,
    training_set: Sequence[dict],
    target_error: float = 1e-6,
    max_extensions: int = 20,
    extension_algorithm: str = "gram_schmidt",
    error_norm: str = "h1_semi",
    use_estimator=False,
    solver_options: Optional[dict] = None,
    verbose: bool = False,
    coercivity=None,
    checkpoint_path: Optional[str] = None,
) -> GreedyResult:
    """Weak greedy: pick the worst-approximated training parameter, extend
    the basis with its (orthonormalized) snapshot, stop at target_error or
    max_extensions (thermalblock_main.py:126-170 semantics).

    use_estimator: False -> detailed solve + true error per candidate (slow,
    exact); True or "riesz" -> offline/online Riesz residual estimator
    (mor/residual.py, the pyMOR-reductor semantics of the reference
    workflow: O(Q^2 n^2) per candidate, no detailed solves); "algebraic" ->
    the O(N) Euclidean residual surrogate.

    coercivity: callable mu -> alpha_LB(mu) dividing the residual dual norm
    into a true-error bound; "min_theta" -> min_theta_coercivity at the
    first training parameter.  With coercivity=None in estimator mode,
    target_error is a RESIDUAL dual-norm tolerance, not a true-error one
    (the two scales differ by the coercivity factor)."""
    reductor = RBReductor(discretization)
    product = discretization.product_matrix(error_norm)
    estimator = None
    online = None
    if use_estimator in (True, "riesz"):
        from .residual import RieszResidualEstimator, min_theta_coercivity

        if coercivity == "min_theta":
            coercivity = min_theta_coercivity(
                discretization.get_operator(),
                discretization.problem.parse_parameter(training_set[0]))
        estimator = RieszResidualEstimator(
            discretization, product=error_norm, coercivity=coercivity
        )
    basis = jnp.zeros((0, discretization.space.num_dofs))
    result = GreedyResult(None, basis)
    if checkpoint_path is not None:
        from .io import load_greedy_state

        state = load_greedy_state(checkpoint_path)
        if state is not None:
            basis, result.selected_mus, result.max_errors, result.extensions = state
            # the stored max_errors include the last pre-extension score;
            # re-evaluation below re-appends it, so drop the tail entry
            result.max_errors = result.max_errors[: result.extensions]
            if verbose:
                print(f"  greedy: resumed {result.extensions} extensions "
                      f"from {checkpoint_path}")
    rm = reductor.reduce(basis)
    if estimator is not None:
        online = estimator.offline(basis)
    result.reduced_model = rm
    stacked = coercivities = None
    if estimator is not None and training_set:
        # one fused vmapped program scores ALL candidates per iteration
        # (mor/batch.py) instead of a Python loop of tiny dispatches
        from .batch import batched_estimates, stack_parameters

        stacked = stack_parameters(discretization.problem, training_set)
        if estimator.coercivity is not None:
            coercivities = np.asarray(
                [float(estimator.coercivity(
                    discretization.problem.parse_parameter(mu)))
                 for mu in training_set])
    for it in range(result.extensions, max_extensions + 1):
        if estimator is not None and training_set:
            errors = list(batched_estimates(online, rm, stacked, coercivities))
        else:
            errors = []
            for mu in training_set:
                if rm.dim == 0 and estimator is None:
                    e = float("inf")
                elif use_estimator == "algebraic":
                    e = reductor.residual_norm(rm, mu)
                else:
                    e = reductor.true_error(rm, mu, error_norm, solver_options)
                errors.append(e)
        worst = int(np.argmax(errors))
        max_err = errors[worst]
        result.max_errors.append(max_err if np.isfinite(max_err) else -1.0)
        if verbose:
            print(f"  greedy it {it}: max err {max_err:.3e} at {worst}")
        if (np.isfinite(max_err) and max_err <= target_error) or it == max_extensions:
            break
        mu = training_set[worst]
        result.selected_mus.append(mu)
        snapshot = discretization.solve(mu, options=solver_options or {"type": "direct"})
        basis = _extend(basis, snapshot, extension_algorithm, product)
        rm = reductor.reduce(basis)
        if estimator is not None:
            online = estimator.offline(basis)
        result.extensions += 1
        if checkpoint_path is not None:
            from .io import save_greedy_state

            save_greedy_state(checkpoint_path, basis, result.selected_mus,
                              result.max_errors, result.extensions)
    result.reduced_model = rm
    result.basis = basis
    return result


def greedy_lrbms(
    block_discretization,
    training_set: Sequence[dict],
    target_error: float = 1e-6,
    max_extensions: int = 20,
    local_product: str = "h1_semi",
    error_norm: str = "h1_semi",
    initial_basis_from_rhs: bool = True,
    final_compression: bool = False,
    solver_options: Optional[dict] = None,
    verbose: bool = False,
    use_estimator=False,
    coercivity=None,
) -> GreedyResult:
    """LRBMS greedy: the basis is block-structured — per-subdomain local
    bases orthonormalized with the *local* products, globalized as
    zero-padded rows (thermalblock_main.py:191-295).  Snapshots are localized
    (d.localize_vector) and each subdomain's basis is extended independently.

    use_estimator=True/"riesz": candidate selection via the offline/online
    Riesz residual estimator on the globalized basis (mor/residual.py) — one
    detailed solve per extension instead of |training_set| per sweep (the
    pyMOR-reductor semantics of the reference workflow).

    coercivity: as in greedy_rb — None makes target_error a residual
    dual-norm tolerance; "min_theta" divides by the min-theta coercivity
    lower bound at the first training parameter.
    """
    d = block_discretization
    S = d.num_subdomains()
    reductor = RBReductor(d)
    error_product = d.product_matrix(error_norm)
    estimator = online = None
    if use_estimator in (True, "riesz"):
        from .residual import RieszResidualEstimator, min_theta_coercivity

        if coercivity == "min_theta":
            coercivity = min_theta_coercivity(
                d.get_operator(),
                d.problem.parse_parameter(training_set[0]))
        estimator = RieszResidualEstimator(
            d, product=error_norm, coercivity=coercivity
        )
    local_products = [d.get_local_product(ss, local_product).freeze({}) for ss in range(S)]
    nloc = [len(d._local_dof_map(ss)) for ss in range(S)]
    local_bases: List[jnp.ndarray] = [jnp.zeros((0, nloc[ss])) for ss in range(S)]

    if initial_basis_from_rhs:
        for ss in range(S):
            v = d.get_local_rhs(ss).freeze(
                d.problem.parse_parameter(training_set[0]) if d.parametric() else {}
            )
            local_bases[ss] = gram_schmidt(v[None, :], local_products[ss])

    def globalize(local_bases):
        rows = []
        for ss, lb in enumerate(local_bases):
            dofs = jnp.asarray(d._local_dof_map(ss))
            for v in lb:
                g = jnp.zeros(d.space.num_dofs).at[dofs].set(v)
                rows.append(g)
        return jnp.stack(rows) if rows else jnp.zeros((0, d.space.num_dofs))

    basis = globalize(local_bases)
    rm = reductor.reduce(basis)
    if estimator is not None:
        online = estimator.offline(basis)
    result = GreedyResult(rm, basis)
    for it in range(max_extensions + 1):
        if estimator is not None:
            errors = [
                online.estimate(mu, rm.solve(mu) if rm.dim else jnp.zeros((0,)))
                for mu in training_set
            ]
        else:
            errors = [
                reductor.true_error(rm, mu, error_norm, solver_options) if rm.dim else float("inf")
                for mu in training_set
            ]
        worst = int(np.argmax(errors))
        max_err = errors[worst]
        result.max_errors.append(max_err if np.isfinite(max_err) else -1.0)
        if verbose:
            print(f"  lrbms greedy it {it}: max err {max_err:.3e}")
        if (np.isfinite(max_err) and max_err <= target_error) or it == max_extensions:
            break
        mu = training_set[worst]
        result.selected_mus.append(mu)
        snapshot = d.solve(mu, options=solver_options or {"type": "direct"})
        for ss in range(S):
            local_snap = d.localize_vector(snapshot, ss)
            stacked = (
                jnp.concatenate([local_bases[ss], local_snap[None, :]])
                if local_bases[ss].shape[0]
                else local_snap[None, :]
            )
            local_bases[ss] = gram_schmidt(stacked, local_products[ss])
        basis = globalize(local_bases)
        rm = reductor.reduce(basis)
        if estimator is not None:
            online = estimator.offline(basis)
        result.extensions += 1
    if final_compression and basis.shape[0]:
        basis, _ = pod(basis, error_product)
        rm = reductor.reduce(basis)
    result.reduced_model = rm
    result.basis = basis
    result.local_bases = local_bases
    return result
