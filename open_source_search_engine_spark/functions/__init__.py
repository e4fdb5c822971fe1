"""Pure computational kernels shared by the Spark engine and the golden oracle."""
