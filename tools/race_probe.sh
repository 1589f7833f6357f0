#!/usr/bin/env bash
# Cross-JVM publish race probe: two driver JVMs write the same topic
# concurrently; a third verifies nothing was lost, duplicated, or
# overlapped. Exercises the publish paths ConnectorSpec cannot reach
# in-process (same-(start,count) createLink collision, different-count
# overlap arbitration) because RipplePublish is synchronized per JVM.
#
# Usage: tools/race_probe.sh [iterations] [rows-per-writer]
# Requires `sbt compile` to have produced target/scala-2.13/classes.
set -euo pipefail
cd "$(dirname "$0")/.."

ITER="${1:-5}"
N="${2:-200}"
CP="target/scala-2.13/classes:/opt/spark/jars/*"

for i in $(seq 1 "$ITER"); do
  ROOT="$(mktemp -d /tmp/raceprobe.XXXXXX)"
  java -cp "$CP" graft.tools.RaceProbe write "$ROOT" race "$N" 1 &
  P1=$!
  java -cp "$CP" graft.tools.RaceProbe write "$ROOT" race "$N" 2 &
  P2=$!
  wait "$P1" "$P2"
  java -cp "$CP" graft.tools.RaceProbe check "$ROOT" race "$((2 * N))"
  rm -rf "$ROOT"
  echo "[probe] iteration $i/$ITER OK"
done
echo "[probe] all $ITER iterations passed"
