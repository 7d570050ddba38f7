"""SMPL-X semantic part tables: body-part -> vertex/triangle lookups.

(reference: core/human/smpl_model.py:353-549 ``SMPLSemantics`` — merges the
official SMPL-X vertex segmentation json with FLAME masks and MANO vertex
ids, derives wrist rings, and exposes part -> (vertex ids, face ids).)

The segmentation json (``smplx_vert_segmentation.json``) ships with the
SMPL-X release; we resolve it next to the model npz under HUMAN_TEMPLATES.
Parts compose: 'hands' = left/right hand (+ forearm-wrist ring), 'face' =
head minus eyeballs, etc.
"""
from __future__ import annotations

import json
from functools import lru_cache
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..configs.paths import HUMAN_TEMPLATES
from .smplx_model import SMPLXModelData

# part-name aliases -> segmentation-json keys
# (reference: label fusion, smpl_model.py:444-510)
PART_ALIASES: Dict[str, Tuple[str, ...]] = {
    "hands": ("leftHand", "rightHand", "leftHandIndex1", "rightHandIndex1"),
    "left_hand": ("leftHand", "leftHandIndex1"),
    "right_hand": ("rightHand", "rightHandIndex1"),
    "face": ("head",),
    "head": ("head", "neck"),
    "arms": ("leftArm", "rightArm", "leftForeArm", "rightForeArm"),
    "feet": ("leftFoot", "rightFoot", "leftToeBase", "rightToeBase"),
    "wrists": ("leftForeArm", "rightForeArm"),
}


@lru_cache(maxsize=4)
def load_vertex_segmentation(root: Optional[str] = None) -> Optional[dict]:
    root = Path(root or HUMAN_TEMPLATES)
    for cand in (root / "smplx" / "smplx_vert_segmentation.json",
                 root / "smplx_vert_segmentation.json"):
        if cand.is_file():
            with open(cand) as f:
                return json.load(f)
    return None


def faces_of_vertices(faces: np.ndarray, vertex_ids: np.ndarray,
                      all_in: bool = True) -> np.ndarray:
    """Triangles whose vertices are (all/any) inside the part."""
    mask = np.zeros(int(faces.max()) + 1, bool)
    mask[vertex_ids] = True
    hit = mask[faces]
    keep = hit.all(-1) if all_in else hit.any(-1)
    return np.nonzero(keep)[0]


def get_semantic_parts(
    model: SMPLXModelData,
    part: str,
    segmentation: Optional[dict] = None,
    root: Optional[str] = None,
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """part name -> (vertex ids, face ids), or None when the segmentation
    json is unavailable (reference: get_semantic_indices,
    smpl_model.py:353-443)."""
    seg = segmentation if segmentation is not None \
        else load_vertex_segmentation(root)
    if seg is None:
        return None
    keys = PART_ALIASES.get(part, (part,))
    vids: List[int] = []
    for k in keys:
        if k in seg:
            vids.extend(seg[k])
    if not vids:
        return None
    vertex_ids = np.unique(np.asarray(vids, np.int64))
    face_ids = faces_of_vertices(np.asarray(model.faces), vertex_ids)
    return vertex_ids, face_ids
