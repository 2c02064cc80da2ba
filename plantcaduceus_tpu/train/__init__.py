"""plantcaduceus_tpu.train subpackage."""
