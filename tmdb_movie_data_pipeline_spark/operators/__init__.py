"""Operator library: pure DataFrame→DataFrame transforms + registered queries."""
