"""SMPL / SMPL-X body model parameters as JAX pytrees.

Replaces the reference's dependency on the `smplx` pip package
(reference: model/smpl.py:66-117) with a self-contained loader. Model
parameters are held in a registered dataclass pytree so the LBS forward pass
jits cleanly; static topology (parent indices, level schedule) lives in
ordinary numpy arrays marked as pytree-static.

Three ways to get a model:
  * `load_smplx_npz(path)`  — official SMPLX_NEUTRAL.npz archives
  * `load_smpl_pkl(path)`   — official SMPL_NEUTRAL.pkl archives (chumpy)
  * `synthetic(...)`        — deterministic random model with the real
                              SMPL/SMPL-X kinematic topology, for tests and
                              benchmarks when licensed assets are absent.
"""

from __future__ import annotations

import dataclasses
import os
import pickle
from typing import Any, Optional, Tuple

import jax
import numpy as np

# ---------------------------------------------------------------------------
# Canonical kinematic topologies (public SMPL/SMPL-X skeleton layouts).
# ---------------------------------------------------------------------------

SMPL_PARENTS = np.array(
    [-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18,
     19, 20, 21],
    dtype=np.int32,
)

SMPLX_PARENTS = np.array(
    [-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18,
     19, 15, 15, 15,
     # left hand: index, middle, pinky, ring, thumb (3 links each)
     20, 25, 26, 20, 28, 29, 20, 31, 32, 20, 34, 35, 20, 37, 38,
     # right hand
     21, 40, 41, 21, 43, 44, 21, 46, 47, 21, 49, 50, 21, 52, 53],
    dtype=np.int32,
)

NUM_BETAS = 10

# Landmark vertex ids appended by the reference stack's vertex-joint selector
# (nose/eyes/ears, toe/heel keypoints, fingertips) for the SMPL wrapper's
# extended 45-joint output (reference: model/smpl.py:88-98).
SMPL_LANDMARK_VERTEX_IDS = np.array(
    [332, 6260, 2800, 4071, 583,            # nose, reye, leye, rear, lear
     3216, 3226, 3387, 6617, 6624, 6787,    # L toes/heel, R toes/heel
     2746, 2319, 2445, 2556, 2673,          # left fingertips
     6191, 5782, 5905, 6016, 6133],         # right fingertips
    dtype=np.int32,
)


def _levels_from_parents(parents: np.ndarray) -> Tuple[Tuple[tuple, tuple], ...]:
    """Group joints into depth levels for parallel chain composition.

    Returns a tuple of (joint_indices, parent_indices) per level (level 0 =
    root excluded). All joints within a level have parents in earlier levels,
    so each level is one batched matmul instead of a per-joint scan.

    Levels are nested int tuples (not arrays): they live in the pytree's
    STATIC metadata, which jit cache keys hash and compare on every call —
    numpy arrays there break the key comparison between two different
    BodyModel instances (ambiguous array truth value) and tuples of this
    size hash in O(J)."""
    depth = np.zeros(len(parents), dtype=np.int32)
    for j in range(1, len(parents)):
        depth[j] = depth[parents[j]] + 1
    levels = []
    for d in range(1, depth.max() + 1):
        idx = np.nonzero(depth == d)[0]
        levels.append((tuple(int(i) for i in idx),
                       tuple(int(p) for p in parents[idx])))
    return tuple(levels)


class _StaticFaces:
    """Hashable wrapper for the triangle-face array held as pytree-static
    metadata. jit cache keys hash/compare static fields on every call, so
    the content hash is computed once here; `BodyModel.faces` unwraps it,
    keeping host call sites (OBJ export, renderer) on a plain array."""

    __slots__ = ("array", "_h")

    def __init__(self, array):
        self.array = np.ascontiguousarray(array, dtype=np.int32)
        self.array.setflags(write=False)
        self._h = hash((self.array.shape, self.array.tobytes()))

    def __eq__(self, other):
        return (isinstance(other, _StaticFaces) and self._h == other._h
                and np.array_equal(self.array, other.array))

    def __hash__(self):
        return self._h


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BodyModel:
    """Parameters of an SMPL-family body model.

    Traced leaves are jnp-convertible arrays; `parents`, `levels`,
    `landmark_vertex_ids`, `name` are static metadata.
    """

    v_template: Any          # [V, 3]
    shapedirs: Any           # [V, 3, n_betas]
    posedirs: Any            # [P, V*3] with P = 9 * (J - 1)
    j_regressor: Any         # [J, V]
    lbs_weights: Any         # [V, J]
    extra_joint_regressor: Any  # [K_extra, V] or None (SMPL: 9 rows)
    # static fields hold only hashable values with simple equality (int
    # tuples / _StaticFaces / str / None): jit cache keys hash and compare
    # them per call, and numpy arrays there raise on instance comparison
    parents: Any = dataclasses.field(metadata=dict(static=True))
    levels: Any = dataclasses.field(metadata=dict(static=True))
    landmark_vertex_ids: Any = dataclasses.field(metadata=dict(static=True))
    name: str = dataclasses.field(metadata=dict(static=True))
    # triangle faces [NF, 3] (int) or None — only used by mesh export/render
    # (reference: model/smpl.py smpl_model.faces via visualize/vis_utils.py:16)
    faces_static: Any = dataclasses.field(default=None,
                                          metadata=dict(static=True))

    @property
    def faces(self):
        """Triangle faces as a plain [NF, 3] int array (or None)."""
        return None if self.faces_static is None else self.faces_static.array

    @property
    def num_joints(self) -> int:
        return len(self.parents)

    @property
    def num_vertices(self) -> int:
        return self.v_template.shape[0]

    @property
    def num_betas(self) -> int:
        return self.shapedirs.shape[-1]


def _make(name, v_template, shapedirs, posedirs, j_regressor, lbs_weights,
          extra_joint_regressor, parents, landmark_vertex_ids,
          faces=None) -> BodyModel:
    f32 = lambda a: np.ascontiguousarray(a, dtype=np.float32)
    return BodyModel(
        v_template=f32(v_template),
        shapedirs=f32(shapedirs),
        posedirs=f32(posedirs),
        j_regressor=f32(j_regressor),
        lbs_weights=f32(lbs_weights),
        extra_joint_regressor=(None if extra_joint_regressor is None
                               else f32(extra_joint_regressor)),
        # static metadata must be hashable with simple equality (jit keys)
        parents=tuple(int(p) for p in np.asarray(parents)),
        levels=_levels_from_parents(np.asarray(parents)),
        landmark_vertex_ids=(None if landmark_vertex_ids is None
                             else tuple(int(i) for i in
                                        np.asarray(landmark_vertex_ids))),
        name=name,
        faces_static=None if faces is None else _StaticFaces(faces),
    )


def _to_np(x) -> np.ndarray:
    """Convert numpy / chumpy / scipy-sparse leaves to dense numpy."""
    if hasattr(x, "toarray"):
        return np.asarray(x.toarray())
    return np.asarray(x)


def _smplx_from_mapping(data, num_betas: int) -> BodyModel:
    """Build the SMPL-X BodyModel from any mapping with the official field
    names (npz archive or chumpy-pickled dict — both releases share them)."""
    shapedirs = _to_np(data["shapedirs"])[:, :, :num_betas]
    posedirs = _to_np(data["posedirs"])
    # stored [V, 3, P]; flatten to [P, V*3] for a single contraction
    posedirs = posedirs.reshape(-1, posedirs.shape[-1]).T
    parents = _to_np(data["kintree_table"])[0].astype(np.int64)
    parents[0] = -1
    nj = 55
    return _make(
        "smplx",
        v_template=_to_np(data["v_template"]),
        shapedirs=shapedirs,
        posedirs=posedirs[: 9 * (nj - 1)],
        j_regressor=_to_np(data["J_regressor"])[:nj],
        lbs_weights=_to_np(data["weights"])[:, :nj],
        extra_joint_regressor=None,
        parents=parents[:nj],
        landmark_vertex_ids=None,
        faces=_to_np(data["f"]) if "f" in data else None,
    )


def load_smplx_npz(path: str, num_betas: int = NUM_BETAS) -> BodyModel:
    """Load an official SMPL-X npz archive (e.g. SMPLX_NEUTRAL.npz)."""
    return _smplx_from_mapping(np.load(path, allow_pickle=True), num_betas)


def load_smplx_pkl(path: str, num_betas: int = NUM_BETAS) -> BodyModel:
    """Load an official SMPL-X pkl archive (chumpy-pickled; SMPL-X is
    released in both forms and the reference's smplx package accepts
    either — reference: model/smpl.py:100-117 via smplx.SMPLXLayer)."""
    with open(path, "rb") as f:
        data = pickle.load(f, encoding="latin1")
    return _smplx_from_mapping(data, num_betas)


def load_smpl_pkl(path: str, num_betas: int = NUM_BETAS,
                  extra_regressor_path: Optional[str] = None) -> BodyModel:
    """Load an official SMPL pkl archive (chumpy-pickled)."""
    with open(path, "rb") as f:
        data = pickle.load(f, encoding="latin1")
    shapedirs = _to_np(data["shapedirs"])[:, :, :num_betas]
    posedirs = _to_np(data["posedirs"])
    posedirs = posedirs.reshape(-1, posedirs.shape[-1]).T
    parents = _to_np(data["kintree_table"])[0].astype(np.int64)
    parents[0] = -1
    extra = None
    if extra_regressor_path and os.path.exists(extra_regressor_path):
        extra = np.load(extra_regressor_path)
    return _make(
        "smpl",
        v_template=_to_np(data["v_template"]),
        shapedirs=shapedirs,
        posedirs=posedirs,
        j_regressor=_to_np(data["J_regressor"]),
        lbs_weights=_to_np(data["weights"]),
        extra_joint_regressor=extra,
        parents=parents,
        landmark_vertex_ids=SMPL_LANDMARK_VERTEX_IDS,
        faces=_to_np(data["f"]) if "f" in data else None,
    )


def synthetic(name: str = "smplx", num_vertices: int = 512,
              num_betas: int = NUM_BETAS, seed: int = 0) -> BodyModel:
    """Deterministic random body model with the real kinematic topology.

    Used by tests and benchmarks: identical tensor shapes/dataflow to the real
    assets (so compiled programs are representative) without shipping licensed
    model data. Rest joints are spread along a plausible chain so kinematics
    are well-conditioned.
    """
    parents = SMPLX_PARENTS if name == "smplx" else SMPL_PARENTS
    nj = len(parents)
    rng = np.random.default_rng(seed)

    # rest joints: random offsets accumulated down the tree (bone lengths ~20cm)
    offsets = rng.normal(scale=0.12, size=(nj, 3))
    joints = np.zeros((nj, 3))
    for j in range(1, nj):
        joints[j] = joints[parents[j]] + offsets[j]

    # vertices scattered around their dominant joint
    dominant = rng.integers(0, nj, size=num_vertices)
    v_template = joints[dominant] + rng.normal(scale=0.05, size=(num_vertices, 3))

    # skinning weights: soft assignment to dominant joint and its parent
    w = np.full((num_vertices, nj), 1e-4)
    w[np.arange(num_vertices), dominant] += 0.8
    par = np.where(parents[dominant] >= 0, parents[dominant], dominant)
    w[np.arange(num_vertices), par] += 0.2
    w /= w.sum(axis=1, keepdims=True)

    # append nj "virtual" vertices placed exactly at the joints and make the
    # joint regressor select them: J_regressor @ v_template == joints exactly,
    # and each virtual vertex is rigidly skinned to its joint — giving the
    # tests an internal consistency anchor (kinematic joints == skinned
    # virtual vertices).
    v_template = np.concatenate([v_template, joints], axis=0)
    jreg = np.concatenate([np.zeros((nj, num_vertices)), np.eye(nj)], axis=1)
    w = np.concatenate([w, np.eye(nj) + 1e-6], axis=0)
    w /= w.sum(axis=1, keepdims=True)
    V = v_template.shape[0]

    shapedirs = rng.normal(scale=0.01, size=(V, 3, num_betas))
    posedirs = rng.normal(scale=0.001, size=(9 * (nj - 1), V * 3))
    # pose correctives don't act on the virtual joint-anchor vertices, so the
    # kinematic-joint == skinned-virtual-vertex identity holds for any pose
    posedirs.reshape(9 * (nj - 1), V, 3)[:, num_vertices:, :] = 0.0

    landmark_ids = None
    extra = None
    if name == "smpl":
        landmark_ids = rng.integers(0, V, size=21).astype(np.int32)
        extra = rng.dirichlet(np.ones(V) * 0.05, size=9)

    # arbitrary consecutive-triple triangulation so mesh-export paths have
    # faces to write without licensed assets
    faces = np.stack(
        [np.arange(0, num_vertices - 2), np.arange(1, num_vertices - 1),
         np.arange(2, num_vertices)], axis=1
    )
    return _make(name, v_template, shapedirs, posedirs, jreg, w, extra,
                 parents, landmark_ids, faces=faces)


_CACHE: dict = {}


def get_body_model(name: str, model_dir: str = "./body_models",
                   allow_synthetic: bool = True) -> BodyModel:
    """Resolve a body model: real assets if present, synthetic fallback.

    Mirrors the reference path contract (reference: utils/config.py:1-20):
    `{model_dir}/smplx/SMPLX_NEUTRAL.npz` / `{model_dir}/smpl/SMPL_NEUTRAL.pkl`.
    """
    key = (name, model_dir)
    if key in _CACHE:
        return _CACHE[key]
    if name == "smplx":
        path = os.path.join(model_dir, "smplx", "SMPLX_NEUTRAL.npz")
        if os.path.exists(path):
            model = load_smplx_npz(path)
        elif allow_synthetic:
            model = synthetic("smplx")
        else:
            raise FileNotFoundError(path)
    elif name == "smpl":
        path = os.path.join(model_dir, "smpl", "SMPL_NEUTRAL.pkl")
        if os.path.exists(path):
            model = load_smpl_pkl(
                path,
                extra_regressor_path=os.path.join(
                    model_dir, "smpl", "J_regressor_extra.npy"),
            )
        elif allow_synthetic:
            model = synthetic("smpl")
        else:
            raise FileNotFoundError(path)
    else:
        raise ValueError(f"unknown body model {name}")
    _CACHE[key] = model
    return model
