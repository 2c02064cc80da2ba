"""plantcaduceus_tpu.compat subpackage."""
