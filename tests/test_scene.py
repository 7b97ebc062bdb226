"""Scene JSON serde + OBJ import tests (reference format parity)."""

import json

import numpy as np
import pytest

from rt_rs_tpu.geom import SceneFormatError
from rt_rs_tpu.scene import Scene
from rt_rs_tpu.scene.obj import load_obj


def test_load_default_scene(scenes_dir):
    scene = Scene.load(str(scenes_dir / "default.json"))
    assert scene.num_prims == 40  # tetrahedron (4) + dodecahedron (36)
    assert scene.num_vertices > 0
    assert scene.camera.pos == (0.0, 0.0, -10.0)
    assert scene.camera_controller.kind == "Orbit"
    assert scene.mat_color.shape[0] >= 1


def test_load_teatime_scene(scenes_dir):
    scene = Scene.load(str(scenes_dir / "teatime.json"))
    assert scene.num_prims == 6320
    assert scene.num_vertices == 3241
    assert scene.light_pos.shape == (2, 3)
    assert scene.camera.pos == (50.0, 10.0, 0.0)


def test_roundtrip(scenes_dir, tmp_path):
    scene = Scene.load(str(scenes_dir / "default.json"))
    out = tmp_path / "roundtrip.json"
    scene.save(str(out))
    again = Scene.load(str(out))
    np.testing.assert_array_equal(scene.prim_indices, again.prim_indices)
    np.testing.assert_array_equal(scene.prim_material, again.prim_material)
    np.testing.assert_allclose(scene.vert_pos, again.vert_pos)
    np.testing.assert_allclose(scene.vert_norm, again.vert_norm)
    np.testing.assert_allclose(scene.mat_albedo, again.mat_albedo)
    # Byte-compare the JSON trees as well (field names / structure).
    with open(scenes_dir / "default.json") as f:
        ref = json.load(f)
    ours = scene.to_json()
    assert set(ours.keys()) == set(ref.keys())
    assert ours["camera_controller"] == ref["camera_controller"]
    assert ours["prims"] == ref["prims"]


def test_invalid_length_rejected():
    with pytest.raises(SceneFormatError):
        Scene.from_json(
            {
                "camera": {"pos": [0, 0], "at": [0, 0, 0]},
                "camera_controller": "Fixed",
                "prims": [],
                "vertices": [],
                "lights": [],
                "materials": [],
            }
        )


def test_obj_import_tetrahedron(meshes_dir):
    scene = Scene.empty()
    obj = load_obj(str(meshes_dir / "tetrahedron.obj"))
    scene.add_mesh(obj, material=1)
    assert scene.num_prims == 4
    assert scene.num_vertices == 4
    # All generated normals are unit length.
    mags = np.linalg.norm(scene.vert_norm, axis=1)
    np.testing.assert_allclose(mags, 1.0, atol=1e-5)
    assert (scene.prim_material == 1).all()


def test_obj_import_matches_default_scene(scenes_dir, meshes_dir):
    """Rebuilding the default scene's tetrahedron from the OBJ must
    reproduce the prims/vertices stored in default.json (which the
    reference's construct tool generated with the same algorithm)."""
    ref = Scene.load(str(scenes_dir / "default.json"))
    scene = Scene.empty()
    scene.add_mesh(load_obj(str(meshes_dir / "tetrahedron.obj")), material=1)
    n = scene.num_vertices
    # The tetrahedron occupies the first 4 prims / vertices of default.json.
    np.testing.assert_array_equal(
        scene.prim_indices, ref.prim_indices[: scene.num_prims]
    )
    np.testing.assert_allclose(scene.vert_pos, ref.vert_pos[:n], rtol=1e-6)
    np.testing.assert_allclose(
        scene.vert_norm, ref.vert_norm[:n], rtol=1e-4, atol=1e-6
    )


def test_obj_import_teapot_matches_teatime(scenes_dir, meshes_dir):
    ref = Scene.load(str(scenes_dir / "teatime.json"))
    scene = Scene.empty()
    scene.add_mesh(load_obj(str(meshes_dir / "teapot.obj")), material=0)
    assert scene.num_prims == ref.num_prims
    assert scene.num_vertices == ref.num_vertices
    np.testing.assert_array_equal(scene.prim_indices, ref.prim_indices)
    np.testing.assert_allclose(scene.vert_pos, ref.vert_pos, rtol=1e-6)
    np.testing.assert_allclose(
        scene.vert_norm, ref.vert_norm, rtol=1e-3, atol=1e-5
    )


def test_unloaded_scene():
    """Scene.unloaded() is the pack_unloaded placeholder
    (scene/mod.rs:115-131): one degenerate prim, zero light, renders
    black; serializing it is an error (the reference's unreachable!)."""
    import numpy as np
    import pytest

    from rt_rs_tpu.scene import Scene, SceneFormatError

    s = Scene.unloaded()
    assert s.is_unloaded
    assert s.num_prims == 1 and s.num_vertices == 1
    assert float(s.light_strength[0]) == 0.0
    arrays = s.pack()
    assert arrays.no_negative_materials
    with pytest.raises(SceneFormatError):
        s.to_json()
    # A loaded scene is never flagged unloaded.
    assert not Scene.empty().is_unloaded
