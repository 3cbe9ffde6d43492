"""docker_aktin_dwh_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of the system provisioned by
``aktin/docker-aktin-dwh`` (reference studied read-only; see SURVEY.md).

The reference is a packaging repo that stands up an i2b2/AKTIN clinical
data warehouse on PostgreSQL 14 (reference: src/docker/database/Dockerfile:8)
fronted by a WildFly app server (src/docker/wildfly/Dockerfile:21).  This
package re-expresses the *capabilities* of that provisioned system —
star-schema OLAP over clinical facts, cohort/panel queries, document and
flat-file ingest, scheduled aggregate reporting, federated broker polling —
as an idiomatic Spark DataFrame/SQL library, plus the large-scale
training-data operators (dedup, similarity search, multimodal columns,
text analysis) required for the 100 TB design point.

Layout
------
- ``session``    SparkSession factory and config policy
- ``catalog``    fixture/table registry (parquet-backed)
- ``registry``   declared-query registry: SURVEY.md §2 ID -> (Spark fn, oracle SQL)
- ``operators``  relational/cohort/EAV/temporal/dedup/similarity/text operators
- ``sources``    batch ingest (CDA-like XML shred, P21 CSV)
- ``streaming``  Structured Streaming variants (windows, broker poll, upsert sink)
- ``functions``  scalar helpers: decimal determinism policy, hashing, text metrics
- ``plans``      explain/bench utilities
"""

__version__ = "0.1.0"
