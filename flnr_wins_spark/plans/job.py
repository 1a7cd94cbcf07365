"""Config-driven pipeline job — the engine's equivalent of running
``wins_staging()`` end-to-end (``src/wins_transform_staging.py:94-292``):

  YAML config -> read sources -> transform + QA -> publish kept + reject
  tables -> deliver run log.

Everything stays lazy until the publish writes; one Spark job per output
table, each fusing read->transform->split->write in a single plan.
"""

from __future__ import annotations

import logging
import os

from pyspark.sql import SparkSession

from flnr_wins_spark.config import PipelineConfig
from flnr_wins_spark.plans.wins_pipeline import run_staging
from flnr_wins_spark.runlog import logged_run
from flnr_wins_spark.sources import publish
from flnr_wins_spark.sources.jdbc import read_lookup


def run_job(
    spark: SparkSession, config: PipelineConfig, notify=None
) -> tuple[bool, str]:
    """Execute the full staging pipeline described by ``config``; returns
    (success, run_log_text). Mirrors the reference's best-effort contract:
    failures are logged and the log is still delivered."""

    def job(log: logging.Logger) -> None:
        tables = {}
        for name, path in config.tables.items():
            tables[name] = spark.read.parquet(path)
            log.info("loaded %s from %s", name, path)
        lookup_src = config.lookup.get("water_pod_table")
        if lookup_src is None:
            raise ValueError("config.lookup must provide water_pod_table")
        creds = None
        if lookup_src.startswith("jdbc:"):
            # the reference's dual-environment credential resolution
            # (env wins, INI fallback) wired to the JDBC branch; parquet
            # stand-ins need none
            from flnr_wins_spark.config import load_credentials

            ini = config.options.get("credentials_ini")
            try:
                creds = load_credentials(ini_path=ini)
            except KeyError:
                log.info("no credentials configured; connecting without auth")
        pod = read_lookup(spark, lookup_src, credentials=creds)
        log.info("loaded POD lookup from %s", lookup_src)

        result = run_staging(tables, pod)
        for name, df in result.tables.items():
            dest = os.path.join(config.staging_dir, name)
            publish(df, dest)
            log.info("published %s -> %s", name, dest)
        for name, df in result.rejects.items():
            dest = os.path.join(config.staging_dir, f"{name}__rejects")
            publish(df, dest)
            log.info("published rejects %s -> %s", name, dest)

    return logged_run(job, notify=notify)
