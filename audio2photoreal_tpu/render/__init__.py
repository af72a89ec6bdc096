from audio2photoreal_tpu.render import quaternion, lbs, geometry, rasterizer, color, viz

__all__ = ["quaternion", "lbs", "geometry", "rasterizer", "color", "viz"]
