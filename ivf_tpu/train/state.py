"""Train state: params + batch_stats + optimizer state in one pytree."""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax
import jax
import optax


@flax.struct.dataclass
class TrainState:
    step: int
    params: Any
    batch_stats: Any
    opt_state: Any
    apply_fn: Callable = flax.struct.field(pytree_node=False)
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    def variables(self):
        v = {"params": self.params}
        if self.batch_stats is not None:
            v["batch_stats"] = self.batch_stats
        return v

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt_state = self.tx.update(
            grads, self.opt_state, self.params
        )
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            batch_stats=(
                new_batch_stats if new_batch_stats is not None else self.batch_stats
            ),
        )


def create_train_state(
    model,
    rng: jax.Array,
    sample_input: jax.Array,
    tx: optax.GradientTransformation,
    init_variables: Optional[dict] = None,
) -> TrainState:
    """Initialize (or adopt imported) variables and wrap with an optimizer."""
    if init_variables is None:
        init_variables = model.init(rng, sample_input)
    params = init_variables["params"]
    return TrainState(
        step=0,
        params=params,
        batch_stats=init_variables.get("batch_stats"),
        opt_state=tx.init(params),
        apply_fn=model.apply,
        tx=tx,
    )
