"""plantcaduceus_tpu.ops subpackage."""
