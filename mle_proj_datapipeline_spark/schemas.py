"""Schema registry: one declared StructType per source table.

The reference infers schemas at silver ingest (inferSchema=True,
utils/silver_*.py:7 — a second full scan per read) and then re-enforces
types at gold via cast dicts (utils/gold_feature_store.py:30-34). Here
every source has a fixed, declared schema (FIXTURES.md reverse-engineers
the column sets from the reference's own references to them).

Columns marked "dropped in silver" are present so the drop operators are
exercised (e.g. utils/silver_loan_terms.py:11-20)."""

from __future__ import annotations

from pyspark.sql.types import (
    DateType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)


def _f(name: str, t, nullable: bool = True) -> StructField:
    return StructField(name, t, nullable)


CREDIT_HISTORY = StructType(
    [
        _f("member_id", StringType(), False),
        _f("snapshot_date", DateType(), False),
        _f("earliest_cr_line", StringType()),  # 'MMM-yyyy'
        _f("mort_acc", IntegerType()),  # flag + fill 0
        # mode-fill family (silver_credit_history.py:31-37)
        _f("inq_last_6mths", IntegerType()),
        _f("pub_rec", IntegerType()),
        _f("delinq_2yrs", IntegerType()),
        # -1-fill family (silver_credit_history.py:40-44)
        _f("mths_since_last_delinq", IntegerType()),
        _f("inq_last_12m", IntegerType()),
        _f("num_tl_30dpd", IntegerType()),
        # dropped in silver (silver_credit_history.py:11-16)
        _f("last_credit_pull_d", StringType()),
        _f("mths_since_last_record", IntegerType()),
    ]
)

DEMOGRAPHIC = StructType(
    [
        _f("member_id", StringType(), False),
        _f("snapshot_date", DateType(), False),
        _f("emp_title", StringType()),
        _f("emp_length", StringType()),  # '10+ years' / '< 1 year' / 'N years'
        _f("home_ownership", StringType()),  # NULL → 'MISSING'
        _f("annual_inc", DoubleType()),
        _f("verification_status", StringType()),
        _f("zip_code", StringType()),  # dropped at gold
        _f("addr_state", StringType()),
        _f("application_type", StringType()),
        # dropped in silver (silver_demographic.py:11-15)
        _f("annual_inc_joint", DoubleType()),
        _f("verification_status_joint", StringType()),
    ]
)

FINANCIAL = StructType(
    [
        _f("member_id", StringType(), False),
        _f("snapshot_date", DateType(), False),
        _f("dti", DoubleType()),  # mean fill
        # missing-flag + fill family (silver_financial.py:14-17)
        _f("all_util", DoubleType()),
        _f("il_util", DoubleType()),
        _f("bc_util", DoubleType()),
        # zero-fill family
        _f("revol_bal", DoubleType()),
        _f("open_acc", IntegerType()),
        # -1-fill family
        _f("total_bal_il", DoubleType()),
        _f("mo_sin_old_il_acct", IntegerType()),
        # dropped in silver (silver_financial.py:11-12)
        _f("dti_joint", DoubleType()),
    ]
)

LOAN_TERMS = StructType(
    [
        _f("id", StringType(), False),
        _f("member_id", StringType(), False),
        _f("snapshot_date", DateType(), False),
        _f("loan_amnt", DoubleType()),
        _f("int_rate", DoubleType()),
        _f("term", StringType()),  # ' 36 months' / ' 60 months'
        _f("grade", StringType()),  # A..G, ~3% NULL
        _f("sub_grade", StringType()),  # dropped at gold
        _f("issue_d", DateType()),  # dropped at gold
        _f("purpose", StringType()),
        _f("pymnt_plan", StringType()),  # y/n
        _f("debt_settlement_flag", StringType()),  # Y/N
        _f("initial_list_status", StringType()),  # w/f
        _f("disbursement_method", StringType()),  # Cash/DirectPay
        # dropped in silver (silver_loan_terms.py:11-20 — 2 of the 37)
        _f("url", StringType()),
        _f("out_prncp", DoubleType()),
    ]
)

DOMAIN_TABLES = {
    "credit_history": CREDIT_HISTORY,
    "demographic": DEMOGRAPHIC,
    "financial": FINANCIAL,
    "loan_terms": LOAN_TERMS,
}
