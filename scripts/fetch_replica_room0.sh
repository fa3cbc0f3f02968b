#!/bin/bash
# Fetch the Replica room0 sequence (Gaussian-SLAM / NICE-SLAM packaging:
# results/frame*.jpg + depth*.png + traj.txt) into data/Replica/room0 so the
# `realdata`-marked tests and configs/Replica/room0.yaml can run against it.
#
# NO-OP when offline or already present — this environment has zero egress;
# the hook exists so that the moment the repo lands somewhere with network
# (or a mounted dataset), real-scene parity vs BASELINE.md is one command:
#   bash scripts/fetch_replica_room0.sh && python -m pytest -m realdata -q
set -u
DEST="$(cd "$(dirname "$0")/.." && pwd)/data/Replica"
if [ -f "$DEST/room0/traj.txt" ]; then
  echo "room0 already present at $DEST/room0"
  exit 0
fi
URL="https://cvg-data.inf.ethz.ch/nice-slam/data/Replica.zip"
if ! curl -sfI --max-time 10 "$URL" > /dev/null 2>&1; then
  echo "offline (cannot reach $URL) — skipping fetch (no-op)"
  exit 0
fi
mkdir -p "$DEST"
TMP="$(mktemp -d)"
trap 'rm -rf "$TMP"' EXIT
echo "downloading Replica (~12 GB, all scenes)..."
curl -sfL --retry 3 -o "$TMP/Replica.zip" "$URL" || { echo "download failed"; exit 1; }
python - "$TMP/Replica.zip" "$DEST" <<'EOF'
import sys, zipfile, pathlib
zf, dest = sys.argv[1], pathlib.Path(sys.argv[2])
with zipfile.ZipFile(zf) as z:
    names = [n for n in z.namelist() if "room0/" in n]
    for n in names:
        z.extract(n, dest.parent)
print(f"extracted {len(names)} room0 files")
EOF
echo "done: $DEST/room0"
