"""Import-only torch stand-in: /root/reference/fork/timers.py imports
torch at module level but the CPU timer never touches it."""
