"""P21 flat-file import (SRC-04) — the §21 KHEntgG billing-data path.

The reference processes zipped semicolon-CSV via Python import scripts
installed at /var/lib/aktin/import-scripts (reference
src/docker/wildfly/Dockerfile:48, copied from the dwh package at
src/build.sh:252); admission/discharge date columns were added by
update02_add_missing_p21_dates.sql (src/docker/database/Dockerfile:32).

Critical semantic carried over: the zip code column is a STRING with
leading zeros (update01_convert_zipcodes_to_str.sql,
src/docker/database/Dockerfile:31) — hence the explicit schema; schema
inference would destroy German PLZ values.
"""

from __future__ import annotations

import zipfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

P21_SCHEMA = ("encounter_id long, admission_ts timestamp_ntz, "
              "discharge_ts timestamp_ntz, zip string, age int")


def read_p21(spark: SparkSession, path: str) -> DataFrame:
    """Semicolon CSV with header; explicit schema (zip stays string)."""
    return (spark.read.schema(P21_SCHEMA)
            .option("sep", ";").option("header", "true")
            .option("timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss")
            .csv(path))


def extract_zip_archives(src_dir: str, work_dir: str) -> list[str]:
    """Unzip *.zip drop files into a work dir (driver-side, IO-bound —
    the reference's import scripts do the same; at scale this step runs
    on the landing zone before Spark reads the extracted CSVs)."""
    out: list[str] = []
    for z in sorted(Path(src_dir).glob("*.zip")):
        with zipfile.ZipFile(z) as zf:
            for name in zf.namelist():
                if name.endswith(".csv"):
                    zf.extract(name, work_dir)
                    out.append(str(Path(work_dir) / name))
    return out


def p21_to_visits(p21: DataFrame) -> DataFrame:
    """Normalize to the visit_dimension shape (LOS in hours derived)."""
    return p21.select(
        F.col("encounter_id").alias("encounter_num"),
        F.col("admission_ts").alias("start_date"),
        F.col("discharge_ts").alias("end_date"),
        F.col("zip").alias("zip_cd"),
        F.col("age"),
        ((F.unix_micros(F.col("discharge_ts").cast("timestamp"))
          - F.unix_micros(F.col("admission_ts").cast("timestamp")))
         / 3_600_000_000.0).alias("los_hours"),
    )
