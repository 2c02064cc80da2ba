"""plantcaduceus_tpu.models subpackage."""
