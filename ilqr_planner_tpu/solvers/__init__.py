"""Solvers: recursive iLQR, AL-iLQR, batch iLQR (+ control primitives), LQT."""
