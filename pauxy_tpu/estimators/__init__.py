"""Estimators: local energies, mixed estimates, back propagation, ITCF."""
