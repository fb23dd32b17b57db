from .multimodal import (  # noqa: F401
    decode_audio,
    decode_image,
    extract_image_features,
    fake_decode_image,
    resize_images,
    sample_video_frames,
)
