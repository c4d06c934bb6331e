#!/usr/bin/env bash
# Start the engine's HTTP API locally.
#   AQE_DATA_DIR  parquet directory to register (default /root/testdata/sf0.01)
#   AQE_PORT      listen port (default 8080)
set -euo pipefail
cd "$(dirname "$0")"
export AQE_DATA_DIR="${AQE_DATA_DIR:-/root/testdata/sf0.01}"
export AQE_PORT="${AQE_PORT:-8080}"
exec python -m approximate_query_engine_spark.api
