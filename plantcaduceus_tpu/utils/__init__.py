"""plantcaduceus_tpu.utils subpackage."""
