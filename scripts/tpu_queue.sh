#!/bin/bash
# Serial TPU job queue for the tunneled single-chip environment.
#
# Only ONE process may own the tunneled chip; a client racing a dying
# client's teardown hangs FOREVER at backend init.  So: run jobs strictly
# serially, watchdog the init phase (kill + quiet period + retry), and
# leave 75 s between jobs for the tunnel teardown to settle.
#
# Usage:  scripts/tpu_queue.sh jobs.txt
#   where jobs.txt has one job per line:  <tag> <command...>
# Logs land in /tmp/job_<tag>.log; JSON result lines are echoed on stdout.

set -u
cd "$(dirname "$0")/.."

run_with_retry() {
  local tag="$1"; shift
  # the job line is a shell COMMAND STRING: quoted arguments and paths
  # with spaces survive, unlike unquoted word splitting.  `bash -c` with
  # exec keeps $! == the python PID (a plain `eval "..." &` would
  # background a wrapper subshell, and the init watchdog's kill would
  # orphan the python client -- the exact tunnel-wedging race this queue
  # exists to prevent)
  local cmd="$1"
  for attempt in 1 2 3 4 5; do
    local log="/tmp/job_${tag}.log"
    # JOB_TIMEOUT caps the WHOLE attempt: the init watchdog below only
    # covers pre-banner hangs, but a client can also wedge *after* the
    # banner when it races a dying client's tunnel teardown (observed
    # round 4: an attempt sat post-banner for >15 min).  timeout(1)
    # forwards TERM to the python child.
    bash -c "exec timeout ${JOB_TIMEOUT:-14400} python -u $cmd" > "$log" 2>&1 &
    local pid=$!
    local ok=0
    # watchdog: the axon platform banner appears once backend init succeeds
    for i in $(seq 1 48); do
      sleep 5
      if ! kill -0 "$pid" 2>/dev/null; then ok=2; break; fi
      if grep -q "Platform 'axon' is experimental\|Not saving model snapshots\|backend probe attempt\|^{" "$log"; then ok=1; break; fi
    done
    if [ $ok -eq 0 ]; then
      echo "[$tag] attempt $attempt stuck at init; retrying" >&2
      kill "$pid" 2>/dev/null; wait "$pid" 2>/dev/null; sleep 75; continue
    fi
    wait "$pid"
    local status=$?
    if [ $status -ne 0 ]; then
      # covers both post-init failures and early deaths (import errors
      # etc. exit before the init banner and land here via ok=2)
      echo "[$tag] attempt $attempt exited with status $status; retrying" >&2
      sleep 75; continue
    fi
    if ! grep "^{" "$log"; then
      # a "successful" job that emitted no JSON result line is a failure
      echo "[$tag] attempt $attempt exited 0 but printed no JSON line" >&2
      sleep 75; continue
    fi
    return 0
  done
  echo "[$tag] FAILED after retries" >&2
  return 1
}

first=1
while read -r tag cmd; do
  [ -z "${tag:-}" ] && continue
  case "$tag" in \#*) continue ;; esac
  [ $first -eq 0 ] && sleep 75
  first=0
  run_with_retry "$tag" "$cmd"
done < "$1"
echo QUEUE_DONE
