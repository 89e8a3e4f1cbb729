"""Algorithms: DataLoader, Reconciliator, DQValidator, Sensor, GAB."""
