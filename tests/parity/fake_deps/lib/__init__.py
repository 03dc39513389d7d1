"""Placeholder for the external HoHoNet `lib` package (imported, never run)."""
