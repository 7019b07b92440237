"""Model zoo: flax encoder stack + functional decoder family."""
