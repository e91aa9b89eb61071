#!/usr/bin/env bash
# Runs the real-Kafka acceptance tests against the docker-compose
# broker. The Kafka connector jar is resolved by spark-submit's ivy
# machinery via PYSPARK_SUBMIT_ARGS --packages (downloads on first
# run; pin the version to the installed pyspark).
set -euo pipefail
cd "$(dirname "$0")/../.."
SPARK_VER="$(python -c 'import pyspark; print(pyspark.__version__)')"
SCALA_SUFFIX="2.13"
export SPARK_GRAFT_KAFKA_BOOTSTRAP="${SPARK_GRAFT_KAFKA_BOOTSTRAP:-localhost:9092}"
export PYSPARK_SUBMIT_ARGS="--packages org.apache.spark:spark-sql-kafka-0-10_${SCALA_SUFFIX}:${SPARK_VER} pyspark-shell"
exec python -m pytest tests/test_kafka_gated.py -v "$@"
