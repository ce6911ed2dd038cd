"""End-to-end pipelines: channel sounding, dataset generation, closed-loop
data transmission."""

from mamimo_tpu.pipeline.sounding import SoundingResult, sound_packet  # noqa: F401
