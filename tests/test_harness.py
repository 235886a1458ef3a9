"""Guard: the virtual 8-device CPU mesh must be real, else every
"distributed" test silently degenerates to one shard."""
import jax


def test_virtual_mesh_present():
    devs = jax.devices()
    assert len(devs) == 8, devs
    assert all(d.platform == "cpu" for d in devs)
