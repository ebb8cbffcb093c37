"""Incremental materialized-view maintenance over the CDC stream.

The reference engine recomputes every derived table from scratch on each
run (``rdf_star_etl_yarrrml.py`` has no notion of a delta); the CDC-native
engine can do better: given a view computed over the state as of LSN T, the
current state, and the post-T changelog delta, produce the view over the
current state WITHOUT touching unchanged groups. This is classic
recompute-touched-groups incremental view maintenance — the general form
that stays correct under updates AND deletes and for NON-retractable
aggregates (``max``, ``count(DISTINCT …)``) where delta-merging partials
cannot work.

Contract: ``compute(state_subset)`` must be a per-``key_col``-group
pipeline — every output row derives only from state rows sharing its key
(true for ``analytics.conv_stats``, ``training.training_pairs``,
``corpus.flatten_conversations``, …). Then:

- untouched keys keep their ``prev_view`` rows verbatim (streamed filter,
  zero recompute downstream);
- touched keys are recomputed from their FULL current state (a streamed
  ``is_in`` filter keeps those rows; one broadcast of the changed-key set);
- a key whose state rows all disappeared (full delete) yields no recompute
  rows and its stale view rows are filtered out — deletes converge.

Scale shape: the changed-key set is reduced via per-block ``unique``
partials (:func:`training.changed_keys` — the key SET reaches the driver,
never delta rows) and broadcast once via ``ray.put``; both filters are
vectorized Arrow ``is_in`` map stages; only touched groups' rows enter
``compute``'s exchange. Cost is O(view + touched-state), independent of the
untouched corpus beyond the streaming filter scan.

NULL group keys: ``changed_keys`` drops NULL (SQL join semantics — a NULL
delta key marks nothing), so a NULL-keyed view group is always treated as
untouched. Callers whose delta can carry NULL keys for real changes should
recompute the NULL group explicitly.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["refresh_view"]


def refresh_view(
    prev_view: "object",
    state: "object",
    delta: "object",
    compute,
    *,
    key_col: str = "conv_id",
):
    """Refresh ``prev_view`` (the ``compute`` view over the state as of T)
    to the view over ``state`` (current), given the post-T ``delta``
    changelog. Returns ``untouched prev_view rows ∪ compute(touched
    state rows)`` — equal to ``compute(state)`` whenever ``compute`` is
    per-key (see module docstring)."""
    import ray

    from .training import changed_keys

    keys = changed_keys(delta, key_col=key_col)
    keys_ref = ray.put(keys)

    def _mask(batch: pa.Table):
        col = batch.column(key_col)
        if pa.types.is_null(col.type):
            col = col.cast(pa.string())
        return pc.fill_null(pc.is_in(col, value_set=ray.get(keys_ref)), False)

    def keep_untouched(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.invert(_mask(batch))).replace_schema_metadata(
            None
        )

    def keep_touched(batch: pa.Table) -> pa.Table:
        return batch.filter(_mask(batch)).replace_schema_metadata(None)

    untouched = prev_view.map_batches(keep_untouched, batch_format="pyarrow")
    recomputed = compute(
        state.map_batches(keep_touched, batch_format="pyarrow")
    )
    return untouched.union(recomputed)
