#!/bin/bash
# Reset-insurance watcher (VERDICT r4 #7): while a chip queue runs, snapshot
# its metric CSVs / summaries / manifests / log tails into
# docs/examples/insurance/ and commit them with a pathspec-scoped commit
# every INTERVAL seconds. A host reset then costs minutes of replay, not the
# campaign. The pathspec commit never touches anything else staged in the
# index, so it is safe to run concurrently with interactive work.
#
# Launch: setsid bash scripts/insurance_watch.sh > /tmp/insurance_watch.log 2>&1 &
#         echo $! > /tmp/insurance_watch.pid
# Stop:   kill -- -$(cat /tmp/insurance_watch.pid)
INTERVAL=${INTERVAL:-300}
cd "$(dirname "$0")/.."
while true; do
  python scripts/insure_artifacts.py || true
  if ! git diff --quiet -- docs/examples/insurance \
     || [ -n "$(git ls-files --others --exclude-standard docs/examples/insurance)" ]; then
    git add docs/examples/insurance \
      && git commit -q -m "insurance: snapshot in-flight campaign artifacts" \
           -- docs/examples/insurance \
      || true
  fi
  sleep "$INTERVAL"
done
