"""Public rasterize API — implemented in milestone M2 (placeholder)."""


def rasterize(scene, camera, lights, cfg):
    raise NotImplementedError("rasterize lands in M2")
