#!/bin/bash
# Whole-suite env matrix — the reference CI runs its entire test suite under
# {default, Persistent, Persistent+FlushThreshold=20, Transient}
# (.github/workflows/rust.yml:27-34); this is the equivalent here, plus a
# device-path pass on the virtual 8-device CPU mesh.
set -e
cd "$(dirname "$0")/.."

run() {
    label="$1"; shift
    echo "=== matrix: $label"
    "$@" python -m pytest tests/ -q --tb=short -p no:cacheprovider 2>&1 | tail -2
}

run "default"                      env -u PersistenceType -u VELOCI_SPILL_PAIRS
run "Transient"                    env PersistenceType=Transient
run "Persistent (mmap round-trip)" env PersistenceType=Persistent
run "Persistent + spill=1"         env PersistenceType=Persistent VELOCI_SPILL_PAIRS=1
run "device path (MIN_DOCS=1)"     env VELOCI_DEVICE_MIN_DOCS=1
echo "=== matrix: all green"
