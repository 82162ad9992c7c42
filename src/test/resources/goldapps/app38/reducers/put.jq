.command | del(._command)
