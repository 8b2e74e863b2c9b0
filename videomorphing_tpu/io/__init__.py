"""L6 — host-side I/O: images, clips, project files.

Rebuild of the reference's OpenCV/Qt I/O glue (SURVEY.md section 2 layer L6).
Decoding happens on the host (PIL / npz / raw frame store / optional ffmpeg),
arrays move to device in batches; the C++ streaming runtime in ``native/``
accelerates the hot uint8->float conversion + prefetch path for config 5.
"""

from videomorphing_tpu.io.images import load_image, save_image, to_float, to_uint8
from videomorphing_tpu.io.clips import load_clip, save_clip, open_clip_reader
from videomorphing_tpu.io.project import Project, load_project, save_project

__all__ = [
    "load_image",
    "save_image",
    "to_float",
    "to_uint8",
    "load_clip",
    "save_clip",
    "open_clip_reader",
    "Project",
    "load_project",
    "save_project",
]
