from __future__ import annotations

import pytest

from app_fastdata_spark.functions.asserts import (
    ExpectationError,
    expect_scalar,
    expect_scalar_long,
    expect_scalar_match,
    expect_zero_or_one_row,
)


def test_expect_scalar(spark):
    df = spark.createDataFrame([(7,)], "v int")
    assert expect_scalar(df) == 7
    assert expect_scalar_long(df) == 7
    assert expect_scalar_match(df, 7) == 7


def test_expect_scalar_rejects_multi(spark):
    df = spark.createDataFrame([(1,), (2,)], "v int")
    with pytest.raises(ExpectationError):
        expect_scalar(df)


def test_expect_scalar_long_rejects_double(spark):
    df = spark.createDataFrame([(1.5,)], "v double")
    with pytest.raises(ExpectationError):
        expect_scalar_long(df)


def test_expect_scalar_match_mismatch(spark):
    df = spark.createDataFrame([(1,)], "v int")
    with pytest.raises(ExpectationError):
        expect_scalar_match(df, 2)


def test_expect_zero_or_one_row(spark):
    assert expect_zero_or_one_row(spark.createDataFrame([], "v int")) == []
    assert len(expect_zero_or_one_row(spark.createDataFrame([(1,)], "v int"))) == 1
    with pytest.raises(ExpectationError):
        expect_zero_or_one_row(spark.createDataFrame([(1,), (2,)], "v int"))
