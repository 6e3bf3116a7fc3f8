"""Boundary contract enforcement for the extracted table (SURVEY.md §1.3).

The reference validates its output contract twice per file with Pydantic
(ParserOutput.model_validate, wellsfargo_mastercard_parser.py:701-718). The
engine's analog: the schema is a ``pyarrow.Schema`` cast and the semantic
invariants are vectorized predicates — violations divert (like problem rows),
or raise in strict mode at the producer boundary.

Invariants (FIXTURES.md §1):
- status ∈ {ok, error, empty}
- error IS NULL  ⇔  status == ok
- status == ok   ⇒  extracted_text non-empty and n_blocks ≥ 1
- status != ok   ⇒  extracted_text == ""
- part_id ∈ [0, num_partitions)
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..schemas import DEFAULT_NUM_PARTITIONS, EXTRACTED_SCHEMA

_STATUSES = pa.array(["ok", "error", "empty"])


def invariant_violations(batch: pa.Table, num_partitions: int = DEFAULT_NUM_PARTITIONS) -> pa.Array:
    """Per-row violation reason (null = valid)."""
    status = batch.column("status")
    is_ok = pc.equal(status, "ok")
    text_len = pc.utf8_length(pc.cast(batch.column("extracted_text"), pa.string()))
    bad_status = pc.invert(pc.is_in(status, value_set=_STATUSES))
    bad_error = pc.xor(is_ok, pc.is_null(batch.column("error")))  # ok ⇔ error null
    bad_ok_text = pc.and_(
        is_ok,
        pc.or_(pc.equal(text_len, 0), pc.less(batch.column("n_blocks"), 1)),
    )
    bad_bad_text = pc.and_(pc.invert(is_ok), pc.greater(text_len, 0))
    bad_part = pc.or_(
        pc.less(batch.column("part_id"), 0),
        pc.greater_equal(batch.column("part_id"), num_partitions),
    )
    return pc.if_else(
        bad_status,
        pa.scalar("bad_status"),
        pc.if_else(
            bad_error,
            pa.scalar("error_null_mismatch"),
            pc.if_else(
                bad_ok_text,
                pa.scalar("ok_without_text"),
                pc.if_else(
                    bad_bad_text,
                    pa.scalar("text_on_failed_row"),
                    pc.if_else(
                        bad_part, pa.scalar("part_id_out_of_range"), pa.scalar(None, pa.string())
                    ),
                ),
            ),
        ),
    )


def validate_extracted(ds, *, strict: bool = True, num_partitions: int = DEFAULT_NUM_PARTITIONS):
    """Schema cast + invariant check as a streaming combinator.

    strict=True raises on the first violating batch (producer-boundary mode);
    strict=False diverts violations into a ``contract_violation`` column for
    the problems path."""

    def check(batch: pa.Table) -> pa.Table:
        batch = batch.cast(EXTRACTED_SCHEMA)
        reasons = invariant_violations(batch, num_partitions)
        n_bad = len(batch) - reasons.null_count
        if strict and n_bad:
            bad = batch.filter(pc.is_valid(reasons))
            raise ValueError(
                f"extracted-contract violation in {n_bad} rows; first url="
                f"{bad.column('url')[0].as_py()!r} reason="
                f"{reasons.drop_null()[0].as_py()!r}"
            )
        if not strict:
            batch = batch.append_column("contract_violation", reasons)
        return batch

    return ds.map_batches(check, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
