#!/bin/bash
# Scale-probe launcher: plain-java (no sbt lock) run of graft.ScaleProbe.
# Usage: tools/run_scale_probe.sh [base_dir] [mults] [queries]
set -u
cd "$(dirname "$0")/.."
ADDOPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
SPARK_GRAFT_SCALE_BASE="${1:-/root/testdata/sf0.1}" \
SPARK_GRAFT_SCALE_MULTS="${2:-1,8,32}" \
SPARK_GRAFT_SCALE_QUERIES="${3:-dedup_minhash,semantic_dedup,knn_graph,substring_dup,sssp_weighted,stream_session_rocksdb}" \
SPARK_GRAFT_SCALE_DIR="${SPARK_GRAFT_SCALE_DIR:-/tmp/graft_scale}" \
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-16}" \
exec java $ADDOPENS -Xmx"${SPARK_DRIVER_MEM:-24g}" -Duser.timezone=UTC \
  -Dspark.ui.enabled=false \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.ScaleProbe
