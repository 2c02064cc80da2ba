"""plantcaduceus_tpu.io subpackage."""
