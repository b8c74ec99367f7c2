NAME          KNAP6
ROWS
 N  COST
 L  CAP
COLUMNS
    MARKER                 'MARKER'                 'INTORG'
    X1        COST         -10.0   CAP        5.0
    X2        COST         -13.0   CAP        7.0
    X3        COST          -7.0   CAP        4.0
    X4        COST          -8.0   CAP        3.0
    X5        COST         -12.0   CAP        6.0
    X6        COST          -9.0   CAP        5.0
    MARKER                 'MARKER'                 'INTEND'
RHS
    RHS       CAP           14.0
BOUNDS
 UP BND       X1             1.0
 UP BND       X2             1.0
 UP BND       X3             1.0
 UP BND       X4             1.0
 UP BND       X5             1.0
 UP BND       X6             1.0
ENDATA
