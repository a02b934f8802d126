from .api import (DepthEstimationServer, create_asgi_app,
                  decode_png_to_pipeline_image, encode_disparity_png)

__all__ = ["DepthEstimationServer", "create_asgi_app",
           "decode_png_to_pipeline_image", "encode_disparity_png"]
