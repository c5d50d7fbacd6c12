"""Geometry construction funnel + the 8-check integrity gate.

Parity: ``src/intravascular/io/build.rs`` and
``src/intravascular/io/integrity_check.rs`` of the reference.  Every entry
point (file or array) builds through here.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from ..models.contour import PyContour
from ..models.frame import PyFrame, create_catheter_points
from ..models.geometry import PyGeometry
from ..models.point import PyContourPoint
from ..models.record import PyRecord
from .csv_io import InputData, process_directory


def points_to_array(points) -> np.ndarray:
    """(N, 6) [frame, x, y, z, point_index, aortic] from a point list or an
    (N, >=4) array."""
    if isinstance(points, np.ndarray):
        arr = np.asarray(points, dtype=np.float64)
        out = np.zeros((arr.shape[0], 6))
        out[:, :4] = arr[:, :4]
        if arr.shape[1] > 4:
            out[:, 5] = arr[:, 4]
        return out
    out = np.empty((len(points), 6))
    for i, p in enumerate(points):
        out[i, 0] = p.frame_index
        out[i, 1] = p.x
        out[i, 2] = p.y
        out[i, 3] = p.z
        out[i, 4] = p.point_index
        out[i, 5] = p.aortic
    return out


def build_contours_with_mapping(
    points,
    records: Optional[List[PyRecord]],
    kind: str,
    frame_mapping: Dict[int, int],
) -> List[PyContour]:
    """Group raw points by frame_index, map to shared sequential ids, attach
    lumen measurements.  Parity: Contour::build_contour_with_mapping
    (contour.rs:158-211).  Accepts point lists or (N, >=4) arrays."""
    arr = points_to_array(points)

    measurements = None
    if kind == "Lumen":
        measurements = {}
        if records:
            for r in records:
                measurements[r.frame] = (r.measurement_1, r.measurement_2)

    frames = arr[:, 0].astype(np.int64)
    order = np.argsort(frames, kind="stable")  # preserves within-frame order
    arr = arr[order]
    frames = frames[order]
    uniq, starts = np.unique(frames, return_index=True)
    bounds = np.append(starts, len(frames))

    coords_all = np.ascontiguousarray(arr[:, 1:4])
    point_idx_all = arr[:, 4].astype(np.int64)
    aortic_all = arr[:, 5].astype(bool)

    contours: List[PyContour] = []
    for k, original_frame_idx in enumerate(uniq.tolist()):
        if original_frame_idx not in frame_mapping:
            raise KeyError(f"No mapping found for original frame {original_frame_idx}")
        sequential_id = frame_mapping[original_frame_idx]
        aortic = pulmonary = None
        if measurements is not None and original_frame_idx in measurements:
            aortic, pulmonary = measurements[original_frame_idx]
        lo, hi = bounds[k], bounds[k + 1]
        contours.append(
            PyContour.from_arrays(
                sequential_id,
                original_frame_idx,
                coords_all[lo:hi].copy(),
                (0.0, 0.0, 0.0),
                frames[lo:hi].copy(),
                point_idx_all[lo:hi].copy(),
                aortic_all[lo:hi].copy(),
                aortic,
                pulmonary,
                kind,
            )
        )
    return contours


def build_geometry_from_inputdata(
    input_data: Optional[InputData] = None,
    path=None,
    label: str = "",
    diastole: bool = True,
    image_center=(4.5, 4.5),
    radius: float = 0.5,
    n_points: int = 20,
    verbose: bool = True,
) -> PyGeometry:
    """Single construction funnel: shared frame-id mapping across contour
    types -> contour building -> catheter synthesis -> frame assembly ->
    record reordering -> CCW sort -> proximal-at-zero -> integrity gate.
    Parity: build.rs:9-205."""
    if input_data is None:
        if path is None:
            raise ValueError("Either input_data or path must be provided")
        input_data = process_directory(path, None, diastole, label)

    def frame_ids_of(group):
        if isinstance(group, np.ndarray):
            return set(group[:, 0].astype(int).tolist())
        return {p.frame_index for p in group}

    all_original_frames = frame_ids_of(input_data.lumen)
    for group in (input_data.eem, input_data.calcification, input_data.sidebranch):
        if group is not None:
            all_original_frames.update(frame_ids_of(group))
    if input_data.ref_point is not None:
        all_original_frames.add(input_data.ref_point.frame_index)

    sorted_original = sorted(all_original_frames)
    frame_mapping = {orig: i for i, orig in enumerate(sorted_original)}

    lumen_contours = build_contours_with_mapping(
        input_data.lumen, input_data.record, "Lumen", frame_mapping
    )
    extra_groups = {
        "Eem": input_data.eem,
        "Calcification": input_data.calcification,
        "Sidebranch": input_data.sidebranch,
    }

    frame_map: Dict[int, PyFrame] = {}
    for contour in lumen_contours:
        contour.compute_centroid()
        frame = PyFrame(contour.id, contour.centroid, contour, {}, None)
        if (
            input_data.ref_point is not None
            and frame_mapping.get(input_data.ref_point.frame_index) == contour.id
        ):
            frame.reference_point = input_data.ref_point.copy()
        frame_map[contour.id] = frame

    for kind, group in extra_groups.items():
        if group is None:
            continue
        for contour in build_contours_with_mapping(group, None, kind, frame_mapping):
            contour.compute_centroid()
            if contour.id in frame_map:
                frame_map[contour.id].extras[kind] = contour

    if n_points > 0:
        # catheter synthesis: one ring per frame at the frame's (constant) z.
        # Parity: Frame::create_catheter_points uses the first-encountered z
        # per original frame (frame.rs:163-204).
        import math as _math

        angles = 2.0 * _math.pi * np.arange(n_points) / n_points
        ring_x = image_center[0] + radius * np.cos(angles)
        ring_y = image_center[1] + radius * np.sin(angles)
        catheter_rows = []
        for frame in frame_map.values():
            if frame.lumen.n_points == 0:
                continue
            orig = frame.lumen.original_frame
            z = float(frame.lumen.xyz_view()[0, 2])
            block = np.empty((n_points, 4))
            block[:, 0] = orig
            block[:, 1] = ring_x
            block[:, 2] = ring_y
            block[:, 3] = z
            catheter_rows.append(block)
        if catheter_rows:
            for contour in build_contours_with_mapping(
                np.concatenate(catheter_rows), None, "Catheter", frame_mapping
            ):
                contour.compute_centroid()
                if contour.id in frame_map:
                    frame_map[contour.id].extras["Catheter"] = contour

    frames = sorted(frame_map.values(), key=lambda f: f.id)
    geometry = PyGeometry(frames, label)

    if input_data.record is not None:
        geometry.reorder_frames(input_data.record, diastole)

    from ..models.batched import ccw_sort_frames

    ccw_sort_frames(geometry.frames)

    geometry.ensure_proximal_at_position_zero()

    for frame in geometry.frames:
        frame.set_value(frame.id, None, None, None)

    check_geometry_integrity(geometry)

    if verbose:
        _print_success_message(input_data, path is not None)
    return geometry


def _print_success_message(input_data: InputData, from_path: bool) -> None:
    print(f"\n✅ Successfully built geometry from {'path' if from_path else 'input data'}")
    check = lambda present: "✅" if present else "❌"  # noqa: E731
    print("-----------------------------------------")
    print(f"{check(len(input_data.lumen) > 0)} Lumen")
    print(f"{check(input_data.eem is not None)} Eem")
    print(f"{check(input_data.calcification is not None)} Calcification")
    print(f"{check(input_data.sidebranch is not None)} Sidebranch")
    print("✅ Catheter")
    print("-----------------------------------------")
    print(f"Label: {input_data.label}")
    print(f"Diastole phase: {'Yes' if input_data.diastole else 'No'}")
    print()


# ---------------------------------------------------------------------------
# integrity checks
# ---------------------------------------------------------------------------

_EPSILON = 1e-6


def _approx_equal(a, b) -> bool:
    return all(abs(a[i] - b[i]) < _EPSILON for i in range(3))


def check_geometry_integrity(geometry: PyGeometry) -> None:
    """8 invariant checks; raises ValueError on the first failure.
    Parity: integrity_check.rs:8-234."""
    if not geometry.frames:
        raise ValueError("Geometry has no frames")
    for name, fn in (
        ("check_frame_ids_consecutive", _check_frame_ids_consecutive),
        ("check_centroids_match", _check_centroids_match),
        ("check_lumen_presence", _check_lumen_presence),
        ("check_reference_point", _check_reference_point),
        ("check_contour_point_counts", _check_contour_point_counts),
        ("check_original_frame_consistency", _check_original_frame_consistency),
        ("check_proximal_end_index", _check_proximal_end_index),
        ("check_z_distribution", _check_z_distribution),
    ):
        try:
            fn(geometry)
        except ValueError as e:
            print(f"Integrity check '{name}' failed: {e}")
            raise


def _check_frame_ids_consecutive(geometry: PyGeometry) -> None:
    for index, frame in enumerate(geometry.frames):
        if frame.id != index:
            raise ValueError(
                f"Frame IDs are not consecutive. Expected ID {index}, found ID {frame.id}"
            )


def _check_centroids_match(geometry: PyGeometry) -> None:
    for frame_index, frame in enumerate(geometry.frames):
        pts = frame.lumen.xyz_view()
        computed = tuple(pts.mean(axis=0)) if len(pts) else (0.0, 0.0, 0.0)
        lumen_centroid = frame.lumen.centroid if frame.lumen.centroid is not None else computed
        if not _approx_equal(frame.centroid, lumen_centroid):
            raise ValueError(
                f"Frame centroid does not match lumen centroid in frame {frame_index} "
                f"(ID {frame.id}). Frame: {frame.centroid}, Lumen: {lumen_centroid}"
            )
        if frame.lumen.centroid is not None and not _approx_equal(
            frame.lumen.centroid, computed
        ):
            raise ValueError(
                f"Stored lumen centroid does not match computed centroid in frame "
                f"{frame_index} (ID {frame.id})"
            )


def _check_lumen_presence(geometry: PyGeometry) -> None:
    for frame_index, frame in enumerate(geometry.frames):
        if frame.lumen.n_points == 0:
            raise ValueError(
                f"Lumen contour has no points in frame {frame_index} (ID {frame.id})"
            )
        if frame.lumen.kind != "Lumen":
            raise ValueError(
                f"Lumen contour has incorrect type in frame {frame_index} "
                f"(ID {frame.id}). Expected Lumen, found {frame.lumen.kind}"
            )


def _check_reference_point(geometry: PyGeometry) -> None:
    n = sum(1 for f in geometry.frames if f.reference_point is not None)
    if n != 1:
        raise ValueError(f"Expected exactly one reference point, found {n}")


def _check_contour_point_counts(geometry: PyGeometry) -> None:
    expected: Dict[str, int] = {}
    for frame_index, frame in enumerate(geometry.frames):
        for kind, contour in [("Lumen", frame.lumen)] + list(frame.extras.items()):
            count = contour.n_points
            if kind in expected:
                if count != expected[kind]:
                    raise ValueError(
                        f"{kind} contour point count mismatch in frame {frame_index} "
                        f"(ID {frame.id}). Expected {expected[kind]}, found {count}"
                    )
            else:
                expected[kind] = count


def _check_original_frame_consistency(geometry: PyGeometry) -> None:
    for frame_index, frame in enumerate(geometry.frames):
        expected = frame.lumen.original_frame
        for kind, contour in frame.extras.items():
            if contour.original_frame != expected:
                raise ValueError(
                    f"Original frame mismatch in frame {frame_index} (ID {frame.id}). "
                    f"Lumen has original_frame {expected}, {kind} has "
                    f"original_frame {contour.original_frame}"
                )
        if (
            frame.reference_point is not None
            and frame.reference_point.frame_index != expected
        ):
            raise ValueError(
                f"Reference point original frame mismatch in frame {frame_index} "
                f"(ID {frame.id})"
            )


def _check_proximal_end_index(geometry: PyGeometry) -> None:
    proximal_idx = geometry.find_proximal_end_idx()
    zs = np.array([f.centroid[2] for f in geometry.frames])
    min_idx = int(np.argmin(zs))
    if proximal_idx != min_idx:
        raise ValueError(
            f"Proximal end index is {proximal_idx}, but frame with minimum z is "
            f"{min_idx} (z={zs[min_idx]})."
        )


def _check_z_distribution(geometry: PyGeometry) -> None:
    z0 = geometry.frames[0].centroid[2]
    zn = geometry.frames[-1].centroid[2]
    if z0 > zn:
        raise ValueError(f"First frame has higher z-coords {z0} than last frame {zn}")
