"""Checksum + schema manifest for the raw paired-motion npz tree.

The reference fetches `seulzx/smplx_datasets` from ModelScope with no
integrity or schema checks (scripts/data/download_data.py:12-16) and its
preprocessing dispatches on `dim % 3 == 0` first (process_data.py:16-21),
which would silently misparse a 21-joint quaternion stream (21*4=84 is also
divisible by 3). This module gates both failure modes before training sees
the data:

- schema validation: `joint_pos` must be (T, 29) float, `smplx_pose_body`
  must be (T, 21, 3) or (T, 63) axis-angle — anything else is an error, not
  a guess;
- sha256 manifest (`MANIFEST.json` at the tree root): the first verified run
  records checksums, subsequent runs enforce them, so a re-download or a
  partial extraction cannot silently change the training set.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
from dataclasses import dataclass, field
from typing import Dict, List

import numpy as np

MANIFEST_NAME = "MANIFEST.json"

# ModelScope coordinates of the reference dataset (download_data.py:12-16).
DATASET = {
    "id": "seulzx/smplx_datasets",
    "repo_type": "dataset",
    "keys": ("joint_pos", "smplx_pose_body"),
    "robot_dof": 29,
    "human_joints": 21,
}

G1_DOF = 29
HUMAN_JOINTS = 21


@dataclass
class VerifyReport:
    ok: bool = True
    checked: int = 0
    recorded: int = 0
    errors: List[str] = field(default_factory=list)

    def summary(self) -> str:
        status = "OK" if self.ok else "FAILED"
        return (f"verify {status}: {self.checked} file(s) checked, "
                f"{self.recorded} checksum(s) recorded, "
                f"{len(self.errors)} error(s)")


def candidate_files(root: str) -> List[str]:
    """All raw npz files under the tree, in deterministic order."""
    return sorted(glob.glob(os.path.join(root, "**", "*.npz"), recursive=True))


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _check_schema(path: str, errors: List[str]) -> None:
    # allow_pickle=False: the raw tree is untrusted downloaded content and the
    # schema only admits plain float arrays — a pickled (object) entry must be
    # rejected, not executed. np.load raises on object arrays without pickle;
    # that is the correct outcome for this gate.
    with np.load(path, allow_pickle=False) as data:
        for key in DATASET["keys"]:
            if key not in data:
                errors.append(f"{path}: missing key {key!r}")
                return
        jp = np.asarray(data["joint_pos"])
        if jp.ndim != 2 or jp.shape[1] != G1_DOF:
            errors.append(
                f"{path}: joint_pos shape {jp.shape} != (T, {G1_DOF})")
        body = np.asarray(data["smplx_pose_body"])
        flat = int(np.prod(body.shape[1:])) if body.ndim >= 2 else -1
        aa_ok = (
            (body.ndim == 3 and body.shape[1:] == (HUMAN_JOINTS, 3))
            or (body.ndim == 2 and flat == HUMAN_JOINTS * 3)
        )
        if not aa_ok:
            errors.append(
                f"{path}: smplx_pose_body shape {body.shape} is not "
                f"axis-angle (T, {HUMAN_JOINTS}, 3) / (T, {HUMAN_JOINTS * 3}) "
                f"— quaternion or unknown layouts are rejected (the %3-first "
                f"dispatch would misparse them)")
        if len(jp) != len(body):
            errors.append(
                f"{path}: joint_pos T={len(jp)} != smplx_pose_body T={len(body)}")


def verify_tree(root: str) -> VerifyReport:
    """Schema-validate every npz under `root` and record/enforce checksums.

    First verified run writes MANIFEST.json; later runs compare against it and
    record any new files. The manifest is only (re)written when everything
    passed, so a failing tree never overwrites known-good checksums.
    """
    report = VerifyReport()
    files = candidate_files(root)
    if not files:
        report.ok = False
        report.errors.append(f"no npz files under {root}")
        return report

    manifest_path = os.path.join(root, MANIFEST_NAME)
    known: Dict[str, str] = {}
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            known = json.load(f)

    updated = dict(known)
    present = set()
    for path in files:
        rel = os.path.relpath(path, root)
        present.add(rel)
        report.checked += 1
        try:
            _check_schema(path, report.errors)
        except (ValueError, OSError) as e:
            # np.load(allow_pickle=False) raises on object/pickled entries —
            # untrusted content that must be rejected, not executed
            report.errors.append(f"{rel}: unreadable without pickle ({e})")
        digest = _sha256(path)
        if rel in known:
            if known[rel] != digest:
                report.errors.append(f"{rel}: checksum mismatch")
        else:
            updated[rel] = digest
            report.recorded += 1

    # files recorded in the manifest but gone from the tree: a partial
    # re-extraction silently shrinking the training set is an error
    for rel in sorted(set(known) - present):
        report.errors.append(f"{rel}: in manifest but missing from tree")

    report.ok = not report.errors
    if report.ok and updated != known:
        with open(manifest_path, "w") as f:
            json.dump(updated, f, indent=1, sort_keys=True)
    return report
