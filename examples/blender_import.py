"""Import multimodars_tpu OBJ output into Blender and set up a turntable.

Blender-side counterpart of the pipeline's OBJ/MTL export — run it INSIDE
Blender (4.x), not from a normal Python:

    blender --python examples/blender_import.py -- /path/to/output/rest

It imports every ``*.obj`` in the directory (the per-phase mesh sequence
written by ``from_file_full(write_obj=True)`` / ``to_obj``), keyframes the
sequence so interpolation steps play back as an animation, surrounds the
vessel with a ring of area lights, and parents the camera to an orbiting
empty for a turntable render.

Surface parity: /root/reference/examples/blender_script.py:1 (OBJ-sequence
import + lights + orbit animation for Blender 4.x).
"""

import math
import sys
from pathlib import Path

try:
    import bpy
except ImportError:  # pragma: no cover - only importable inside Blender
    bpy = None

# -- configuration ----------------------------------------------------------
FRAMES_PER_MESH = 2      # playback speed of the interpolation sequence
ORBIT_FRAMES = 240       # camera turntable length
N_LIGHTS = 8
LIGHT_RADIUS = 12.0
LIGHT_ENERGY = 800.0


def _obj_dir() -> Path:
    # blender passes script args after a literal "--"
    argv = sys.argv
    args = argv[argv.index("--") + 1 :] if "--" in argv else argv[1:]
    return Path(args[0]) if args else Path("output/rest")


def reset_scene() -> None:
    """Start from an empty scene (keeps the default world)."""
    bpy.ops.object.select_all(action="SELECT")
    bpy.ops.object.delete(use_global=False)


def import_obj_sequence(directory: Path):
    """Import every OBJ, keyframed so mesh i is visible on frames
    [i*FRAMES_PER_MESH, (i+1)*FRAMES_PER_MESH)."""
    paths = sorted(directory.glob("*.obj"))
    if not paths:
        raise SystemExit(f"no OBJ files in {directory}")
    imported = []
    for i, path in enumerate(paths):
        before = set(bpy.data.objects)
        bpy.ops.wm.obj_import(filepath=str(path))
        new = [o for o in bpy.data.objects if o not in before]
        start = i * FRAMES_PER_MESH
        end = (i + 1) * FRAMES_PER_MESH
        for obj in new:
            # visibility keyframes: hidden everywhere except [start, end)
            for frame, hidden in ((start - 1, True), (start, False), (end, True)):
                if frame < 0:
                    continue
                obj.hide_viewport = hidden
                obj.hide_render = hidden
                obj.keyframe_insert("hide_viewport", frame=frame)
                obj.keyframe_insert("hide_render", frame=frame)
        imported.extend(new)
    return imported


def scene_center(objects):
    lo = [min(min(v.co[k] for v in o.data.vertices) for o in objects) for k in range(3)]
    hi = [max(max(v.co[k] for v in o.data.vertices) for o in objects) for k in range(3)]
    return [(a + b) / 2.0 for a, b in zip(lo, hi)]


def add_light_ring(center) -> None:
    for i in range(N_LIGHTS):
        angle = 2.0 * math.pi * i / N_LIGHTS
        data = bpy.data.lights.new(f"ring_light_{i}", type="AREA")
        data.energy = LIGHT_ENERGY
        light = bpy.data.objects.new(f"ring_light_{i}", data)
        light.location = (
            center[0] + LIGHT_RADIUS * math.cos(angle),
            center[1] + LIGHT_RADIUS * math.sin(angle),
            center[2] + LIGHT_RADIUS / 2.0,
        )
        bpy.context.collection.objects.link(light)


def add_turntable_camera(center, n_meshes: int) -> None:
    pivot = bpy.data.objects.new("camera_pivot", None)
    pivot.location = center
    bpy.context.collection.objects.link(pivot)

    cam_data = bpy.data.cameras.new("camera")
    cam = bpy.data.objects.new("camera", cam_data)
    cam.location = (LIGHT_RADIUS * 1.5, 0.0, LIGHT_RADIUS / 3.0)
    cam.parent = pivot
    bpy.context.collection.objects.link(cam)
    bpy.context.scene.camera = cam

    track = cam.constraints.new("TRACK_TO")
    track.target = pivot

    seq_end = n_meshes * FRAMES_PER_MESH
    pivot.rotation_euler = (0.0, 0.0, 0.0)
    pivot.keyframe_insert("rotation_euler", frame=seq_end)
    pivot.rotation_euler = (0.0, 0.0, 2.0 * math.pi)
    pivot.keyframe_insert("rotation_euler", frame=seq_end + ORBIT_FRAMES)

    scene = bpy.context.scene
    scene.frame_start = 0
    scene.frame_end = seq_end + ORBIT_FRAMES


def main() -> None:
    if bpy is None:
        raise SystemExit(
            "blender_import.py must run inside Blender:\n"
            "  blender --python examples/blender_import.py -- <obj_dir>"
        )
    directory = _obj_dir()
    reset_scene()
    objects = import_obj_sequence(directory)
    center = scene_center(objects)
    add_light_ring(center)
    add_turntable_camera(center, len(objects))
    print(f"imported {len(objects)} meshes from {directory}; "
          f"timeline 0..{bpy.context.scene.frame_end}")


if __name__ == "__main__":
    main()
