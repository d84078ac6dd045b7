"""Offset replay + checkpoint inspection utilities.

Rebuilds the reference's two auxiliary entry points:

- ``ReadByAssignOffset`` (recovery replay from an offsets file,
  /root/reference/.../ReadByAssignOffset.scala:29-66): its CSV offset file
  (``topic,partition,fromOffset,untilOffset`` — files/offset.log:1-5)
  translates to the Kafka source's ``startingOffsets`` JSON; run the same
  pipeline with a fresh checkpoint and upsert idempotence absorbs overlap.
- ``ZookeeperManager.main`` (offset inspection,
  ZookeeperManager.scala:148-153): reads the latest offsets the pipeline
  committed — now from the Structured Streaming checkpoint WAL instead of
  ZooKeeper znodes.
"""

from __future__ import annotations

import json
import os


def offsets_csv_to_starting_json(csv_text: str) -> str:
    """``topic,partition,from,until`` lines → startingOffsets JSON.

    Uses field 3 (untilOffset) as the resume point, exactly like the
    reference's readers (ZookeeperManager.scala:83, KafkaManager.scala:63-69).
    """
    out: dict[str, dict[str, int]] = {}
    for line in csv_text.strip().splitlines():
        parts = line.strip().split(",")
        if len(parts) < 4:
            continue
        topic, partition, _from_off, until = parts[0], parts[1], parts[2], parts[3]
        out.setdefault(topic, {})[partition] = int(until)
    return json.dumps(out, sort_keys=True)


def read_checkpoint_offsets(checkpoint_dir: str) -> dict:
    """Latest committed per-partition offsets from a checkpoint WAL —
    the inspection utility (no Spark session needed)."""
    odir = os.path.join(checkpoint_dir, "offsets")
    if not os.path.isdir(odir):
        return {}
    batches = sorted(int(f) for f in os.listdir(odir) if f.isdigit())
    if not batches:
        return {}
    path = os.path.join(odir, str(batches[-1]))
    with open(path, encoding="utf-8") as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    # v1 format: line0 "v1", line1 metadata JSON, line2+ per-source offsets
    offsets = []
    for ln in lines[2:]:
        try:
            offsets.append(json.loads(ln))
        except json.JSONDecodeError:
            offsets.append(ln)
    return {"batch": batches[-1], "sources": offsets}


def main() -> None:  # pragma: no cover - thin CLI
    import argparse

    ap = argparse.ArgumentParser(description="offset replay / inspection")
    sub = ap.add_subparsers(dest="cmd", required=True)
    conv = sub.add_parser("to-starting-offsets", help="offset.log CSV → JSON")
    conv.add_argument("path")
    insp = sub.add_parser("show-checkpoint", help="print checkpoint offsets")
    insp.add_argument("checkpoint_dir")
    args = ap.parse_args()
    if args.cmd == "to-starting-offsets":
        with open(args.path, encoding="utf-8") as f:
            print(offsets_csv_to_starting_json(f.read()))
    else:
        print(json.dumps(read_checkpoint_offsets(args.checkpoint_dir), indent=2))


if __name__ == "__main__":
    main()
