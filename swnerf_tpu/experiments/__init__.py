"""Side experiments (reference 2d_pos_encoding/)."""
