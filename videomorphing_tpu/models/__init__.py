"""Model families: configured, callable morphers.

The reference's "models" are its two pipelines — image-pair morphing [TOG14]
and video morphing [EGSR14] (SURVEY.md section 1). Each morpher bundles the
frozen parameter set with the functional pipeline so a configured instance
is a pure array-in/array-out callable (jit-friendly, shardable).
"""

from videomorphing_tpu.models.image_morph import ImageMorpher, MorphArtifacts
from videomorphing_tpu.models.video_morph import VideoMorpher

__all__ = ["ImageMorpher", "MorphArtifacts", "VideoMorpher"]
