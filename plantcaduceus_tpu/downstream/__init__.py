"""plantcaduceus_tpu.downstream subpackage."""
