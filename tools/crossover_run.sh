#!/bin/bash
# One JVM per query (heap/GC state from a heavy neighbor query otherwise
# pollutes min-of-runs by 2-10x on this box), min of SPARK_GRAFT_RUNS reps.
# Usage: tools/crossover_run.sh <dataDir> <outJsonl> <query...>
set -e
DIR=$1; OUT=$2; shift 2
: > "$OUT"
for q in "$@"; do
  SPARK_GRAFT_SF_DIR="$DIR" SPARK_GRAFT_RUNS=${SPARK_GRAFT_RUNS:-3} \
    sbt -batch "runMain graft.Bench $q" 2>&1 | grep '"metric"' >> "$OUT"
  echo "done $q" >&2
done
