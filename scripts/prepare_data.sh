#!/usr/bin/env bash
# Data acquisition: fetches the pre-extracted features + annotations used by
# the three datasets (same upstream sources as the reference pipeline,
# reference prepare_data.sh:1-32) and GloVe embeddings, laying out
# data/{charades,activitynet,tacos,glove}.
#
# Everything is resumable (wget -c) and skipped if already present.
set -euo pipefail

ROOT="${1:-data}"
mkdir -p "$ROOT"/{charades/annotations,activitynet,tacos,glove}

fetch() { # fetch <url> <dest>
  if [ ! -f "$2" ]; then wget -c -O "$2" "$1"; fi
}

echo "== GloVe 6B.300d (parsed directly; no torchtext) =="
if [ ! -f "$ROOT/glove/glove.6B.300d.txt" ]; then
  fetch "http://nlp.stanford.edu/data/glove.6B.zip" "$ROOT/glove/glove.6B.zip"
  unzip -o "$ROOT/glove/glove.6B.zip" glove.6B.300d.txt -d "$ROOT/glove/"
fi

echo "== Charades-STA: I3D-finetuned per-video features + annotations =="
if [ ! -d "$ROOT/charades/features/i3d_finetuned" ]; then
  fetch "http://cvlab.postech.ac.kr/research/LGI/charades_data.tar.gz" \
        "$ROOT/charades/charades_data.tar.gz"
  tar -xzf "$ROOT/charades/charades_data.tar.gz" -C "$ROOT/charades" --strip-components=1
fi
ANN_BASE="https://raw.githubusercontent.com/jiyanggao/TALL/master"
fetch "$ANN_BASE/charades_sta_train.txt" "$ROOT/charades/annotations/charades_sta_train.txt" || true
fetch "$ANN_BASE/charades_sta_test.txt"  "$ROOT/charades/annotations/charades_sta_test.txt"  || true

echo "== ActivityNet-Captions: C3D hdf5 (6 parts) + 2D-TAN annotations =="
ANET="$ROOT/activitynet"
if [ ! -f "$ANET/sub_activitynet_v1-3.c3d.hdf5" ]; then
  for i in 0 1 2 3 4 5; do
    fetch "https://dl.dropboxusercontent.com/s/activitynet_c3d_part${i}" \
          "$ANET/sub_activitynet_v1-3.c3d.hdf5.part${i}" || \
      echo "NOTE: dropbox part ${i} URL may have rotated; see microsoft/VideoX 2D-TAN README"
  done
  cat "$ANET"/sub_activitynet_v1-3.c3d.hdf5.part* > "$ANET/sub_activitynet_v1-3.c3d.hdf5" || true
fi
TAN="https://raw.githubusercontent.com/microsoft/VideoX/master/2D-TAN/data"
for split in train val test; do
  fetch "$TAN/ActivityNet/${split}.json" "$ANET/${split}.json" || true
done

echo "== TACoS: C3D hdf5 + 2D-TAN annotations =="
fetch "https://download.openmmlab.com/mmaction/localization/tall_c3d_features.hdf5" \
      "$ROOT/tacos/tall_c3d_features.hdf5" || \
  echo "NOTE: fetch tall_c3d_features.hdf5 per microsoft/VideoX 2D-TAN README"
for split in train val test; do
  fetch "$TAN/TACoS/${split}.json" "$ROOT/tacos/${split}.json" || true
done

echo "Done. Point config data_dir at $ROOT/{charades,activitynet,tacos} and"
echo "set GLOVE_PATH=$ROOT/glove/glove.6B.300d.txt (cached to .npz on first parse)."
