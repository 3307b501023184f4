"""Shared driver-testdata vocabulary constants.

Lives in its own leaf module so both driver_queries (which re-exports
EVENT_TYPES for compatibility) and monitor_queries can import it at
module-init time without the driver->monitor->driver import cycle that
made `import monitor_queries` order-dependent.
"""

EVENT_TYPES = ["click", "view", "purchase", "signup"]  # 'error' ⇒ vocab violation
LANGS = ["en", "de", "fr", "es"]  # 'zh' ⇒ vocab violation
