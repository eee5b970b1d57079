"""Forward direction: true EPS -> PSMC-style mixed coalescence rates.

Device analogue of MigrationInference.CoalescentRates (reference
MigrationInference.py:542-564), used by the TestModel flow to write .mi
files from an exactly-known demography.

Note: the reference builds the 3-state generator with whatever migration
rates were *last* set on its CorrectLambda singleton (SetMu is never called
inside CoalescentRates), i.e. the last pre-split interval's rates leak into
every interval.  We implement the evident intent instead: each interval uses
its own migration rates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels.correction import coal_rates
from .likelihood import _pulse_update_3state
from .spec import ModelSpec


def coalescent_rates(spec: ModelSpec, mi=None, pu=None):
    """Return (lh_mixed (numT, 2), pr (splitT+1, 3, 2)).

    lh_mixed: pre-split rows are the forward-computed mixed rates; post-split
    rows keep the spec's input rates (the reference's post-split averaging
    loop, :563-564, has an empty range and never runs).
    """
    s = spec.splitT
    mi = jnp.asarray(spec.mi_base if mi is None else mi)
    pu = jnp.asarray(spec.pu_base if pu is None else pu)
    lc = jnp.asarray(spec.lh)
    times = jnp.asarray(spec.times)

    def body(p0, inp):
        lc_t, t_t, mi_t, pu_t = inp
        p0 = _pulse_update_3state(p0, pu_t[0], 0)
        p0 = _pulse_update_3state(p0, pu_t[1], 1)
        lh_t, p_next = coal_rates(lc_t, mi_t, t_t, p0)
        return p_next, (lh_t, p_next.T, p0.T)

    p0 = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], dtype=lc.dtype)
    _, (lh_pre, pr_tail, pr_head) = jax.lax.scan(
        body, p0, (lc[:s], times[:s], mi[:s], pu[:s])
    )
    # reference Pr: the post-pulse initial state at t==0, then the state
    # after each interval (:558-562)
    first = pr_head[0] if s > 0 else p0.T
    pr = jnp.concatenate([first[None], pr_tail], axis=0)
    lh = jnp.concatenate([lh_pre, lc[s:]], axis=0)
    return np.asarray(lh), np.asarray(pr)
