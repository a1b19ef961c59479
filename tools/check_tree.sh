#!/usr/bin/env bash
# Round-close tree hygiene gate (round-17 ask #2): the driver's
# per-round artifacts (BENCH_r*.json, CORRECTNESS_r*.json, and the
# driver-modified BENCH_DETAIL/LEAKCHECK/BENCH_SCALE records) sat
# untracked or dirty at rounds 15 AND 16 close. Run this before
# declaring a round closed; it exits 1 when any round artifact is
# untracked or any tracked file is modified/unstaged.
# -e makes the gate fail CLOSED: a git invocation erroring out must
# abort the script, not read as "no output = clean".
set -eu
cd "$(dirname "$0")/.."

fail=0

untracked=$(git ls-files --others --exclude-standard -- \
  '*.json' '*.md' 'tools/*' 'src/*')
if [ -n "$untracked" ]; then
  echo "UNTRACKED round files:"
  echo "$untracked" | sed 's/^/  /'
  fail=1
fi

dirty=$(git status --porcelain --untracked-files=no)
if [ -n "$dirty" ]; then
  echo "MODIFIED tracked files (commit or restore):"
  echo "$dirty" | sed 's/^/  /'
  fail=1
fi

if [ "$fail" -eq 0 ]; then
  echo "tree clean: all round artifacts tracked and committed"
fi
exit "$fail"
