#!/bin/sh
# Wrap a heavy foreground command so the scaling watcher defers to it:
# refuses to start while a study is in flight (so foreground noise never
# invalidates a running study), and raises the busy flag for the duration
# (so the watcher never fires into foreground Spark work).
set -e
cd "$(dirname "$0")/.."
while [ -e BENCH/.study_inflight ]; do
  echo "scaling study in flight; waiting 60s" >&2
  sleep 60
done
touch BENCH/.busy
trap 'rm -f BENCH/.busy' EXIT INT TERM
"$@"
