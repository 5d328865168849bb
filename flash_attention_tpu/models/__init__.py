"""Model layers built on the attention engine (functional, pytree params)."""
