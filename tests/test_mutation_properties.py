"""Property-based mutation-ordering tests (SURVEY §5.4): random
interleavings of single upserts, deletes, batch upserts, compactions,
and checkpoints must always leave the engine equal to a plain Python
dict replaying the same operations in issue order.

This is the semantics ADVICE r01 flagged as broken (a batch applied
while singles were pending replayed out of order) — the property test
makes the whole ordering space the regression suite.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from distributed_vector_search_system_spark.engine import VectorEngine
from distributed_vector_search_system_spark.schemas import VECTORS_SCHEMA

_IDS = st.integers(min_value=0, max_value=9)
_LABELS = st.integers(min_value=0, max_value=999)

# batch rows carry unique ids: upsert_batch's contract is one row per id
# (dropDuplicates picks an arbitrary winner among duplicates)
_BATCH_ROWS = st.dictionaries(_IDS, _LABELS, min_size=1, max_size=4).map(
    lambda d: sorted(d.items())
)

_OP = st.one_of(
    st.tuples(st.just("upsert"), _IDS, _LABELS),
    st.tuples(st.just("delete"), _IDS),
    st.tuples(st.just("batch"), _BATCH_ROWS),
    st.tuples(st.just("compact")),
    st.tuples(st.just("checkpoint")),
)


def _vec(i: int) -> list[float]:
    return [float(i), 0.0]


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_OP, min_size=1, max_size=8))
def test_engine_state_equals_ordered_dict_replay(spark, ops):
    base = [(i, _vec(i), i) for i in range(5)]
    engine = VectorEngine(
        spark,
        spark.createDataFrame(base, schema=VECTORS_SCHEMA),
        dim=2,
    )
    oracle = {i: lbl for i, _, lbl in base}

    for op in ops:
        kind = op[0]
        if kind == "upsert":
            _, vid, lbl = op
            engine.upsert(vid, _vec(vid), label=lbl)
            oracle[vid] = lbl
        elif kind == "delete":
            _, vid = op
            engine.delete(vid)
            oracle.pop(vid, None)
        elif kind == "batch":
            rows = op[1]
            engine.upsert_batch(
                spark.createDataFrame(
                    [(vid, _vec(vid), lbl) for vid, lbl in rows],
                    schema=VECTORS_SCHEMA,
                )
            )
            oracle.update(dict(rows))
        elif kind == "compact":
            engine.compact()
        elif kind == "checkpoint":
            engine.checkpoint()  # localCheckpoint: also forces compact

    engine.compact()
    got = {r["vec_id"]: r["label"] for r in engine._snapshot.collect()}
    assert got == oracle
