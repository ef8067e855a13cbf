from __future__ import annotations

import os

import pytest


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    from html_parser_spark.session import apply_scale_confs

    spark = (
        apply_scale_confs(
            SparkSession.builder.master(
                f"local[{os.environ.get('SPARK_GRAFT_CPUS', '4')}]"
            )
            .appName("html-parser-spark-tests")
            .config("spark.sql.shuffle.partitions", "8")
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield spark
    spark.stop()
