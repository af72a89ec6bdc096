from audio2photoreal_tpu.render import quaternion, lbs, geometry, rasterizer, color

__all__ = ["quaternion", "lbs", "geometry", "rasterizer", "color"]
