"""Spark 4 SQL surfaces: SQL scripting (compound statements),
session variables, EXECUTE IMMEDIATE, parameterized ``spark.sql``,
and ``DataFrame.transpose`` — the declarative-control-flow API family.

These are API-surface pins (literal expectations), complementing the
hash-oracled catalog entry ``sql_scripting_threshold_report`` which
proves a scripted WHILE loop against a closed-form oracle.
"""

import pytest
from pyspark.errors import AnalysisException


def test_scripting_while_loop_literal(spark):
    rows = spark.sql(
        """
        BEGIN
          DECLARE i INT DEFAULT 0;
          DECLARE acc BIGINT DEFAULT 0;
          WHILE i < 5 DO
            SET acc = acc + i * i;
            SET i = i + 1;
          END WHILE;
          SELECT acc AS sum_sq;
        END
        """
    ).collect()
    assert [r["sum_sq"] for r in rows] == [30]  # 0+1+4+9+16


def test_scripting_if_else(spark):
    rows = spark.sql(
        """
        BEGIN
          DECLARE x INT DEFAULT 7;
          IF x % 2 = 1 THEN
            SELECT 'odd' AS parity;
          ELSE
            SELECT 'even' AS parity;
          END IF;
        END
        """
    ).collect()
    assert [r["parity"] for r in rows] == ["odd"]


def test_session_variable_declare_set_drop(spark):
    spark.sql("DECLARE OR REPLACE VARIABLE flo_thr INT DEFAULT 10")
    try:
        assert spark.sql("SELECT flo_thr AS v").collect()[0]["v"] == 10
        spark.sql("SET VAR flo_thr = 42")
        assert spark.sql("SELECT flo_thr AS v").collect()[0]["v"] == 42
        # variables participate in real queries as constants
        n = spark.range(100).filter("id < flo_thr").count()
        assert n == 42
    finally:
        spark.sql("DROP TEMPORARY VARIABLE flo_thr")
    with pytest.raises(AnalysisException):
        spark.sql("SELECT flo_thr AS v").collect()


def test_execute_immediate_with_using(spark):
    spark.sql("DECLARE OR REPLACE VARIABLE flo_stmt STRING")
    try:
        spark.sql(
            "SET VAR flo_stmt = 'SELECT ? * 10 + ? AS v'"
        )
        rows = spark.sql(
            "EXECUTE IMMEDIATE flo_stmt USING 3, 4"
        ).collect()
        assert rows[0]["v"] == 34
    finally:
        spark.sql("DROP TEMPORARY VARIABLE flo_stmt")


def test_parameterized_sql_named_and_positional(spark):
    named = spark.sql(
        "SELECT :lo + :hi AS s", args={"lo": 2, "hi": 40}
    ).collect()
    assert named[0]["s"] == 42
    pos = spark.sql("SELECT ? || ? AS s", args=["a", "b"]).collect()
    assert pos[0]["s"] == "ab"
    # parameters are VALUES, not splice-able SQL text — an injection
    # attempt stays a literal
    lit = spark.sql(
        "SELECT :v AS s", args={"v": "1; DROP TABLE x"}
    ).collect()
    assert lit[0]["s"] == "1; DROP TABLE x"


def test_dataframe_transpose(spark):
    df = spark.createDataFrame(
        [("q1", 10, 20), ("q2", 30, 40)], "name string, a int, b int"
    )
    t = df.transpose()
    # first column becomes the header row; remaining columns pivot
    assert t.columns == ["key", "q1", "q2"]
    got = {r["key"]: (r["q1"], r["q2"]) for r in t.collect()}
    assert got == {"a": (10, 30), "b": (20, 40)}


def test_scripting_threshold_report_matches_plain_sql(spark, sf_dir):
    """The catalog entry's scripted plan equals the same report written
    as one plain declarative statement (engine-internal consistency,
    independent of the DuckDB oracle)."""
    from flo_spark.queries_ext import sql_scripting_threshold_report

    scripted = {
        (r["o_orderpriority"], r["n_orders"], r["sum_price"],
         r["min_n"], r["pow2_cap"])
        for r in sql_scripting_threshold_report(spark, sf_dir).collect()
    }
    plain = spark.sql(
        """
        WITH t AS (SELECT CAST(floor(count(*) / 200) AS BIGINT) AS min_n
                   FROM orders_script_v),
        cap AS (SELECT CASE WHEN min_n <= 1 THEN CAST(1 AS BIGINT)
                            ELSE CAST(power(2, length(bin(min_n - 1)))
                                      AS BIGINT) END AS pow2_cap, min_n
                FROM t)
        SELECT o_orderpriority, count(*) AS n_orders,
               CAST(floor((sum(CAST(floor((o_totalprice) * 10000 + 0.5)
                                    AS BIGINT)) + 50) / 100.0) / 100.0
                    AS DOUBLE) AS sum_price,
               cap.min_n, cap.pow2_cap
        FROM orders_script_v CROSS JOIN cap
        GROUP BY o_orderpriority, cap.min_n, cap.pow2_cap
        HAVING count(*) >= cap.min_n
        """
    ).collect()
    assert scripted == {
        (r["o_orderpriority"], r["n_orders"], r["sum_price"],
         r["min_n"], r["pow2_cap"])
        for r in plain
    }
