"""Shared corpus-scale resource guards for the from-spec media codecs.

One definition so the decoders' accept/reject envelope cannot silently
diverge (review r15 #6): a corrupt or adversarial header at 100 TB
corpus scale must bound what a single payload may allocate on an
executor, and every codec must draw that line in the same place.
Payloads past the caps raise ValueError in their parser and degrade to
decoder='unsupported' via the dispatch (larger REAL media falls through
to PIL when present)."""

MAX_PIXELS = 1 << 24  # ~16.7M px (~4096x4096) per image payload

MAX_AUDIO_SAMPLES = 1 << 26  # ~67M frames (~25 min stereo 44.1k) per WAV
