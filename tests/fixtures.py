"""Deterministic domain fixtures per FIXTURES.md: 8 Sunday-anchored
weeks × 200 rows of the four entity tables, with injected NULLs, mode
ties, skewed categories, and duplicate rows."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

WEEKS = [dt.date(2024, 1, 7) + dt.timedelta(weeks=i) for i in range(8)]
ROWS_PER_WEEK = 200
SEED = 42


def _rng() -> np.random.Generator:
    return np.random.default_rng(SEED)


def _nullify(rng, s: pd.Series, frac: float) -> pd.Series:
    mask = rng.random(len(s)) < frac
    out = s.copy().astype(object)
    out[mask] = None
    return out


def gen_domain_tables() -> dict[str, pd.DataFrame]:
    rng = _rng()
    n = ROWS_PER_WEEK * len(WEEKS)
    member_ids = [f"M{i:05d}" for i in rng.integers(0, 600, n)]
    # mid-week offsets so the Sunday-week bucketing is non-trivial
    snap = [
        w + dt.timedelta(days=int(d))
        for w, d in zip(
            np.repeat(WEEKS, ROWS_PER_WEEK), rng.integers(0, 7, n)
        )
    ]

    months = ["Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]
    credit = pd.DataFrame(
        {
            "member_id": member_ids,
            "snapshot_date": snap,
            "earliest_cr_line": _nullify(
                rng,
                pd.Series([f"{months[m]}-{y}" for m, y in zip(rng.integers(0, 12, n), rng.integers(1990, 2020, n))]),
                0.1,
            ),
            "mort_acc": _nullify(rng, pd.Series(rng.integers(0, 5, n)), 0.15),
            # tie-friendly small domains for mode fill
            "inq_last_6mths": _nullify(rng, pd.Series(rng.integers(0, 3, n)), 0.2),
            "pub_rec": _nullify(rng, pd.Series(rng.choice([0, 1], n, p=[0.5, 0.5])), 0.2),
            "delinq_2yrs": _nullify(rng, pd.Series(rng.integers(0, 4, n)), 0.1),
            "mths_since_last_delinq": _nullify(rng, pd.Series(rng.integers(0, 80, n)), 0.4),
            "inq_last_12m": _nullify(rng, pd.Series(rng.integers(0, 10, n)), 0.2),
            "num_tl_30dpd": _nullify(rng, pd.Series(rng.integers(0, 3, n)), 0.2),
            "last_credit_pull_d": [f"{months[m]}-2023" for m in rng.integers(0, 12, n)],
            "mths_since_last_record": _nullify(rng, pd.Series(rng.integers(0, 100, n)), 0.5),
        }
    )

    titles = ["engineer", "Teacher ", "nurse", "MANAGER", "driver", "chef", "clerk",
              "analyst", "artist", "farmer", "pilot", "judge", "vet", "coach", "actor"]
    emp_lengths = ["10+ years", "< 1 year"] + [f"{i} year{'s' if i > 1 else ''}" for i in range(1, 10)]
    demo = pd.DataFrame(
        {
            "member_id": member_ids,
            "snapshot_date": snap,
            "emp_title": _nullify(rng, pd.Series(rng.choice(titles, n, p=np.array([20, 15, 12, 10, 8, 6, 5, 5, 4, 4, 3, 3, 2, 2, 1]) / 100)), 0.1),
            "emp_length": _nullify(rng, pd.Series(rng.choice(emp_lengths, n)), 0.1),
            "home_ownership": _nullify(rng, pd.Series(rng.choice(["RENT", "OWN", "MORTGAGE", " rent "], n)), 0.15),
            "annual_inc": _nullify(rng, pd.Series(np.round(rng.uniform(2e4, 2e5, n), 2)), 0.1),
            "verification_status": pd.Series(rng.choice(["Not Verified", "Source Verified", "Verified"], n)),
            "zip_code": pd.Series([f"{z:05d}" for z in rng.integers(10000, 99999, n)]),
            "addr_state": pd.Series(rng.choice(["CA", "NY", "TX", "FL", "WA", "IL", "MA", "GA", "OH", "PA"], n)),
            "application_type": pd.Series(rng.choice(["Individual", "Joint App"], n, p=[0.9, 0.1])),
            "annual_inc_joint": _nullify(rng, pd.Series(np.round(rng.uniform(4e4, 3e5, n), 2)), 0.8),
            "verification_status_joint": _nullify(rng, pd.Series(rng.choice(["Not Verified", "Verified"], n)), 0.8),
        }
    )

    fin = pd.DataFrame(
        {
            "member_id": member_ids,
            "snapshot_date": snap,
            "dti": _nullify(rng, pd.Series(np.round(rng.uniform(0, 40, n), 2)), 0.15),
            "all_util": _nullify(rng, pd.Series(np.round(rng.uniform(0, 100, n), 2)), 0.25),
            "il_util": _nullify(rng, pd.Series(np.round(rng.uniform(0, 100, n), 2)), 0.25),
            "bc_util": _nullify(rng, pd.Series(np.round(rng.uniform(0, 100, n), 2)), 0.25),
            "revol_bal": _nullify(rng, pd.Series(np.round(rng.uniform(0, 5e4, n), 2)), 0.1),
            "open_acc": _nullify(rng, pd.Series(rng.integers(0, 30, n)), 0.1),
            "total_bal_il": _nullify(rng, pd.Series(np.round(rng.uniform(0, 1e5, n), 2)), 0.3),
            "mo_sin_old_il_acct": _nullify(rng, pd.Series(rng.integers(0, 200, n)), 0.3),
            "dti_joint": _nullify(rng, pd.Series(np.round(rng.uniform(0, 40, n), 2)), 0.8),
        }
    )

    loans = pd.DataFrame(
        {
            "id": [f"L{i:06d}" for i in range(n)],
            "member_id": member_ids,
            "snapshot_date": snap,
            "loan_amnt": np.round(rng.uniform(1e3, 4e4, n), 2),
            "int_rate": np.round(rng.uniform(5, 30, n), 2),
            "term": rng.choice([" 36 months", " 60 months"], n),
            "grade": _nullify(rng, pd.Series(rng.choice(list("ABCDEFG"), n, p=[0.25, 0.25, 0.2, 0.12, 0.1, 0.05, 0.03])), 0.03),
            "sub_grade": pd.Series([f"{g}{i}" for g, i in zip(rng.choice(list("ABCDEFG"), n), rng.integers(1, 6, n))]),
            "issue_d": snap,
            "purpose": rng.choice(["debt_consolidation", "credit_card", "home", "car", "medical", "vacation", "moving", "other"], n),
            "pymnt_plan": rng.choice(["y", "n"], n, p=[0.05, 0.95]),
            "debt_settlement_flag": rng.choice(["Y", "N"], n, p=[0.1, 0.9]),
            "initial_list_status": rng.choice(["w", "f"], n),
            "disbursement_method": rng.choice(["Cash", "DirectPay"], n, p=[0.8, 0.2]),
            "url": [f"https://example.com/{i}" for i in range(n)],
            "out_prncp": np.round(rng.uniform(0, 1e4, n), 2),
        }
    )
    # a few exact duplicate loan rows under NEW ids (same member+week ⇒
    # exercises the post-join keyed dedup path)
    dup = loans.iloc[:5].copy()
    dup["id"] = [f"L9{i:05d}" for i in range(5)]
    loans = pd.concat([loans, dup], ignore_index=True)

    return {"credit_history": credit, "demographic": demo, "financial": fin, "loan_terms": loans}
