"""Model definitions: CSM dual transformer, Llama stack, Mimi codec."""
