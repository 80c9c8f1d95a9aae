"""`csm-tpu finetune` sub-commands."""
