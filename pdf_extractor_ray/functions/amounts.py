"""Amount/sign kernels (SURVEY.md §2.2 "Amount sign normalizer").

The reference's convention (/root/reference/dataextractai/utils/
data_transformation.py:31-83): charges/debits negative, credits/payments
positive, with an ``is_charge_positive`` inversion per source (apple_card/
capitalone). Re-expressed as a vectorized keyword-driven sign flip.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def normalize_sign(
    amount_col,
    type_col,
    charge_types: frozenset[str] | set[str],
    *,
    is_charge_positive: bool = False,
) -> pa.Array:
    """amount → signed amount: rows whose type is a charge type become
    negative (or positive when the source inverts the convention)."""
    is_charge = pc.is_in(type_col, value_set=pa.array(sorted(charge_types)))
    if is_charge_positive:
        is_charge = pc.invert(is_charge)
    negated = pc.negate_checked(amount_col)
    return pc.if_else(is_charge, negated, amount_col)


def amount_from_split(credits_col, charges_col) -> pa.Array:
    """credits/charges split columns → one signed amount
    (wellsfargo_mastercard_parser.py:581-600: credits − charges)."""
    c = pc.coalesce(credits_col, pa.scalar(0.0))
    d = pc.coalesce(charges_col, pa.scalar(0.0))
    return pc.subtract(c, d)


def cast_float_default_zero(col) -> pa.Array:
    """Tolerant float cast with 0.0 default (wellsfargo_bank_csv_parser.py:
    35-44): strip currency noise then cast; failures → 0.0."""
    s = pc.cast(col, pa.string())
    s = pc.replace_substring_regex(s, pattern=r"[$,]", replacement="")
    # tolerant: rows that don't look numeric become "0" before the cast
    # (pc.cast raises on unparseable strings even with safe=False)
    numeric = pc.match_substring_regex(s, pattern=r"^-?(\d+\.?\d*|\.\d+)$")
    s = pc.if_else(pc.fill_null(numeric, False), s, pa.scalar("0"))
    return pc.cast(s, pa.float64())
