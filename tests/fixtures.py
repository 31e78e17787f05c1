"""Test fixture shim: the DREAM-format dataset fabricator now lives in the
package (horopose_tpu/tools/synth_dream.py) so demo/benchmark scripts can
use it too; tests keep importing it from here."""

from horopose_tpu.tools.synth_dream import (  # noqa: F401
    make_synthetic_dream_dataset,
)
