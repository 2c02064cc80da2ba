"""plantcaduceus_tpu.cli subpackage."""
